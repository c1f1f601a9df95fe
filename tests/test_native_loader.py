"""Native C++ .npy batch loader: parity with numpy, padding/truncation, f8
conversion, and pipeline integration."""


import numpy as np
import pytest

from vcr_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native loader unavailable (no g++?)")
    return lib


def test_probe_and_load_f4(tmp_path, lib, rng):
    a = rng.standard_normal((7, 12)).astype(np.float32)
    p = str(tmp_path / "a.npy")
    np.save(p, a)
    rows, elems = native.probe_npy(p)
    assert (rows, elems) == (7, 12)

    out = native.load_feature_batch([p], num_frames=10, feat_shape=(12,))
    assert out.shape == (1, 10, 12)
    np.testing.assert_array_equal(out[0, :7], a)
    np.testing.assert_array_equal(out[0, 7:], 0.0)  # zero padding

    out2 = native.load_feature_batch([p], num_frames=4, feat_shape=(12,))
    np.testing.assert_array_equal(out2[0], a[:4])  # truncation


def test_load_f8_converts(tmp_path, lib, rng):
    a = rng.standard_normal((3, 5)).astype(np.float64)
    p = str(tmp_path / "b.npy")
    np.save(p, a)
    out = native.load_feature_batch([p], num_frames=3, feat_shape=(5,))
    np.testing.assert_allclose(out[0], a.astype(np.float32), rtol=1e-6)


def test_multi_file_multi_dim(tmp_path, lib, rng):
    paths = []
    arrays = []
    for i in range(6):
        a = rng.standard_normal((4 + i % 3, 6, 2, 2)).astype(np.float32)
        p = str(tmp_path / f"v{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    out = native.load_feature_batch(paths, num_frames=5, feat_shape=(6, 2, 2),
                                    n_threads=3)
    assert out.shape == (6, 5, 6, 2, 2)
    for i, a in enumerate(arrays):
        n = min(5, a.shape[0])
        np.testing.assert_array_equal(out[i, :n], a[:n])
        np.testing.assert_array_equal(out[i, n:], 0.0)


def test_pipeline_native_matches_python(tmp_path, rng):
    from tests.util_corpus import build_corpus
    from vcr_tpu.data.pipeline import BatchIterator, CaptionDataset
    from vcr_tpu.vocab import Vocab

    glove = build_corpus(str(tmp_path / "data"))
    vocab = Vocab(glove)
    ds = CaptionDataset(str(tmp_path / "data"), "msvd_vgg", "train", vocab, 4, 6)
    it_native = BatchIterator(ds, 4, shuffle=False, seed=7, use_native=True)
    it_python = BatchIterator(ds, 4, shuffle=False, seed=7, use_native=False)
    for bn, bp in zip(it_native, it_python):
        np.testing.assert_array_equal(bn["vid_feats"], bp["vid_feats"])
        np.testing.assert_array_equal(bn["sent"], bp["sent"])
        np.testing.assert_array_equal(bn["sent_len"], bp["sent_len"])
        np.testing.assert_array_equal(bn["valid"], bp["valid"])
        assert bn["refs"] == bp["refs"]
        assert bn["vid_key"] == bp["vid_key"]


def test_unsupported_npy_layout_falls_back_to_python(tmp_path, rng):
    """float16 .npy files: the C++ parser rejects them (rc<0) but np.load
    reads them fine — the pipeline must fall back to the python path with a
    warning instead of crashing training (the documented transparent
    fallback)."""
    import glob
    import warnings

    from tests.util_corpus import build_corpus
    from vcr_tpu.data.pipeline import BatchIterator, CaptionDataset
    from vcr_tpu.vocab import Vocab

    glove = build_corpus(str(tmp_path / "data"))
    # rewrite every feature file as float16
    for f in glob.glob(str(tmp_path / "data" / "msvd_vgg" / "feats" / "*.npy")):
        np.save(f, np.load(f).astype(np.float16))
    vocab = Vocab(glove)
    ds = CaptionDataset(str(tmp_path / "data"), "msvd_vgg", "train", vocab, 4, 6)
    it = BatchIterator(ds, 4, shuffle=False, seed=7, use_native=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the documented fallback warning
        batches = list(it)
    it_py = BatchIterator(ds, 4, shuffle=False, seed=7, use_native=False)
    for bn, bp in zip(batches, it_py):
        np.testing.assert_array_equal(bn["vid_feats"], bp["vid_feats"])
        np.testing.assert_array_equal(bn["valid"], bp["valid"])
