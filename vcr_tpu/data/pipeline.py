"""Host-side input pipeline producing fixed-shape numpy batches.

Replaces the reference's torch Dataset/DataLoader (dataset.py:42-138, custom
collate_fn at dataset.py:28-40) with a TPU-friendly design:

* every batch has STATIC shapes — the final partial batch is zero-padded to
  the full batch size and carries a ``valid`` (B,) mask, so jitted step
  functions compile exactly once;
* per-item semantics are preserved: per-video .npy features zero-padded /
  truncated to ``num_frames`` (dataset.py:77-78), one *random* caption per
  epoch (dataset.py:81), lowercase + <unk>-map + <eos> + <pad> to ``max_len``
  (dataset.py:65-71), reference strings carried for METEOR;
* per-host sharding for multi-host data parallelism (shard_index /
  num_shards), something the single-GPU reference never needed.

Feature loading is batched through a thread pool: .npy reads are GIL-releasing
I/O, so this replaces torch's worker processes (num_workers=4) without IPC.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, Iterator, List

import numpy as np


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Run the underlying iterator in a background thread with a bounded
    queue, overlapping host-side batch assembly (and the device upload that
    jax dispatches asynchronously) with the current step's compute.

    Abandon-safe: if the consumer stops iterating early (preemption return,
    exception in the step loop), the generator's finally sets a stop event
    and drains the queue, so the worker — which puts with a timeout and
    re-checks the event — exits instead of blocking forever on a full queue
    while pinning device-placed batches."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    err: List[BaseException] = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as e:  # surface loader errors in the consumer
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if err:
            raise err[0]
    finally:
        stop.set()
        while True:  # unblock a worker mid-put
            try:
                q.get_nowait()
            except queue.Empty:
                break

from vcr_tpu.data.captions import read_caption_file
from vcr_tpu.vocab import Vocab


class CaptionDataset:
    """One corpus split. Covers both MSVideoDescriptionDataset (msvd, msvd_vgg —
    keyed 'video_key') and MSRVideoToTextDataset (msrvtt — keyed 'video_id')
    (dataset.py:42-138; the two classes are line-for-line identical except for
    the key field)."""

    def __init__(self, root: str, corpus: str, split: str, vocab: Vocab,
                 num_frames: int, max_len: int, feat_type: str = "cnn"):
        assert corpus in ("msvd", "msvd_vgg", "msrvtt")
        self.key_field = "video_id" if corpus == "msrvtt" else "video_key"
        self.corpus_dir = os.path.join(root, corpus)
        self.captions = read_caption_file(
            os.path.join(self.corpus_dir, f"{split}_captions.json"))
        self.vocab = vocab
        self.num_frames = num_frames
        self.max_len = max_len
        if feat_type == "cnn":
            self.vid_feat_dir = os.path.join(self.corpus_dir, "feats/")
        elif feat_type == "yolo":
            self.vid_feat_dir = os.path.join(self.corpus_dir, "bbox_feats/")
        else:
            raise NotImplementedError("unknown feat_type")  # dataset.py:59-60

    def __len__(self) -> int:
        return len(self.captions)

    def load_features(self, idx: int) -> np.ndarray:
        """Load one video's features, zero-pad/truncate to num_frames
        (dataset.py:76-78). Works for (N, V) CNN feats and (N, F, K, K) YOLO."""
        key = self.captions[idx][self.key_field]
        feats = np.load(os.path.join(self.vid_feat_dir, key + ".npy"))
        return np.concatenate(
            [feats, np.zeros((max(0, self.num_frames - feats.shape[0]),
                              *feats.shape[1:]), dtype=feats.dtype)],
            axis=0)[: self.num_frames].astype(np.float32)

    def text_fields(self, idx: int, cap_choice: int) -> Dict:
        """The text half of a sample (dataset.py:73-89). The SINGLE home of
        the caption-encoding semantics — both the python and native batch
        paths go through here, so sent/sent_len/refs can never diverge
        between loaders. cap_choice picks the caption (drawn by the caller —
        np.random.Generator is not thread-safe)."""
        caps = self.captions[idx]["captions"]
        sent_toks = caps[cap_choice % len(caps)]["desc"]
        return {
            "sent": self.vocab.encode(sent_toks, self.max_len),
            "sent_raw": " ".join(sent_toks).lower(),
            "sent_len": min(self.max_len, len(sent_toks) + 1),
            "refs": [" ".join(c["desc"]).lower() for c in caps],
            "vid_key": self.captions[idx][self.key_field],
        }

    def item(self, idx: int, cap_choice: int) -> Dict:
        """One full sample dict (dataset.py:73-89)."""
        out = self.text_fields(idx, cap_choice)
        out["vid_feats"] = self.load_features(idx)
        return out


class BatchIterator:
    """Epoch iterator over fixed-shape batches.

    Yields dicts with numpy arrays: vid_feats (B, ...), sent (B, L) int32,
    sent_len (B,) int32, valid (B,) float32 — plus host-side lists refs /
    vid_key / sent_raw. B is constant; short final batches are padded with
    zeros and valid=0 rows.
    """

    def __init__(self, dataset: CaptionDataset, batch_size: int, shuffle: bool,
                 seed: int = 0, num_shards: int = 1, shard_index: int = 0,
                 num_threads: int = 8, drop_remainder: bool = False,
                 use_native: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0
        self.skip_next = 0  # mid-epoch resume: batches to skip, consumed once
        self.drop_remainder = drop_remainder
        # num_threads<=0 = fully synchronous loading (reference --nworkers 0,
        # DataLoader num_workers=0); a 1-thread pool keeps the code path
        # uniform while serializing loads.
        self.num_threads = max(1, num_threads)
        self._pool = ThreadPoolExecutor(max_workers=self.num_threads)
        self._feat_shape = None
        self.use_native = use_native
        if use_native:
            # the C++ loader needs a consistent per-frame feature shape;
            # probe the first item once
            try:
                from vcr_tpu.data import native

                if native.get_lib() is not None and len(dataset):
                    f0 = dataset.load_features(0)
                    self._feat_shape = tuple(f0.shape[1:])
            except Exception:
                self._feat_shape = None

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.default_rng((self.seed, self.epoch))
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        order = order[self.shard_index::self.num_shards]
        b = self.batch_size
        skip = self.skip_next  # consumed once (first epoch of a mid-epoch resume)
        self.skip_next = 0

        # multi-host lockstep: strided shards differ in length by up to 1, so
        # naive per-shard iteration would give processes DIFFERENT batch
        # counts — the shorter ones would exit the epoch early and deadlock
        # the collectives. Every shard iterates the GLOBAL maximum batch
        # count; exhausted shards emit fully-padded (valid=0) batches.
        # Skipped (already-trained) batches count as emitted: every process
        # resumes with the same skip, so lockstep is preserved.
        emitted = skip
        if self.num_shards > 1:
            max_shard = -(-len(self.ds) // self.num_shards)
            target = (max_shard // b if self.drop_remainder
                      else -(-max_shard // b))
        else:
            target = None

        for start in range(0, len(order), b):
            idxs = order[start:start + b]
            if len(idxs) < b and self.drop_remainder:
                break
            # cap_choices are drawn even for skipped batches so the RNG stream
            # (and thus every later batch) is identical to an unskipped epoch
            cap_choices = rng.integers(0, 2 ** 31, size=len(idxs))
            if skip > 0:
                skip -= 1
                continue  # index-level skip: NO feature IO for this batch
            if self._feat_shape is not None:
                yield self._native_batch(idxs, cap_choices, b)
            else:
                yield self._python_batch(idxs, cap_choices, b)
            emitted += 1
        if target is not None:
            while emitted < target:
                yield self._empty_batch(b)
                emitted += 1
        self.epoch += 1

    def _empty_batch(self, b):
        """All-padding batch (valid=0 everywhere) keeping multi-host epochs in
        lockstep; the masked loss/metrics are proven finite on these."""
        fshape = self._feat_shape or getattr(self, "_pad_shape", None)
        if fshape is None:
            # probe once and cache — padded batches recur every epoch
            # (separate from _feat_shape, which doubles as the native-loader-
            # available flag in __iter__)
            fshape = self._pad_shape = tuple(self.ds.load_features(0).shape[1:])
        feats = np.zeros((b, self.ds.num_frames, *fshape), np.float32)
        return self._assemble(b, feats, [], [], [], [], [])

    def _text_fields(self, idxs, cap_choices):
        sents, lens, raws, refs, keys = [], [], [], [], []
        for idx, choice in zip(idxs, cap_choices):
            t = self.ds.text_fields(int(idx), int(choice))
            sents.append(t["sent"])
            lens.append(t["sent_len"])
            raws.append(t["sent_raw"])
            refs.append(t["refs"])
            keys.append(t["vid_key"])
        return sents, lens, raws, refs, keys

    def _assemble(self, b, feats, sents, lens, raws, refs, keys, idxs=()):
        n = len(sents)
        batch = {
            "vid_feats": feats,
            "sent": np.zeros((b, self.ds.max_len), np.int32),
            "sent_len": np.zeros((b,), np.int32),
            "valid": np.zeros((b,), np.float32),
            # host-side dataset index per row (-1 = padding): lets multi-host
            # eval reconstruct any process's references locally after an
            # allgather of token ids (train/loop.py _gather_global_rows)
            "sample_idx": np.full((b,), -1, np.int32),
            "refs": refs, "vid_key": keys, "sent_raw": raws,
        }
        for j in range(n):
            batch["sent"][j] = sents[j]
            batch["sent_len"][j] = lens[j]
            batch["valid"][j] = 1.0
        for j, idx in enumerate(idxs):
            batch["sample_idx"][j] = int(idx)
        return batch

    def _native_batch(self, idxs, cap_choices, b):
        """Feature IO through the C++ loader (vcr_tpu/data/native.py); text
        fields on the host thread (they're trivial)."""
        from vcr_tpu.data import native

        paths = [os.path.join(self.ds.vid_feat_dir,
                              self.ds.captions[int(i)][self.ds.key_field] + ".npy")
                 for i in idxs]
        try:
            feats = native.load_feature_batch(paths, self.ds.num_frames,
                                              self._feat_shape,
                                              self.num_threads)
        except IOError as e:
            # the C++ parser supports the common little-endian f4/f8 layouts;
            # anything else (f2, big-endian, fortran order) is np.load-able —
            # the documented TRANSPARENT fallback, not a crash
            import warnings

            warnings.warn(f"native .npy loader failed ({e}); falling back to "
                          "the numpy path for this dataset", stacklevel=2)
            feats = None
        if feats is None:  # build failed late / unsupported layout — python
            self._feat_shape = None  # path for good
            return self._python_batch(idxs, cap_choices, b)
        if len(idxs) < b:
            pad = np.zeros((b - len(idxs), *feats.shape[1:]), np.float32)
            feats = np.concatenate([feats, pad], axis=0)
        sents, lens, raws, refs, keys = self._text_fields(idxs, cap_choices)
        return self._assemble(b, feats, sents, lens, raws, refs, keys, idxs)

    def _python_batch(self, idxs, cap_choices, b):
        items = list(self._pool.map(
            lambda pair: self.ds.item(int(pair[0]), int(pair[1])),
            zip(idxs, cap_choices)))
        feats = np.zeros((b, *items[0]["vid_feats"].shape), np.float32)
        for j, it in enumerate(items):
            feats[j] = it["vid_feats"]
        return self._assemble(
            b, feats,
            [it["sent"] for it in items], [it["sent_len"] for it in items],
            [it["sent_raw"] for it in items], [it["refs"] for it in items],
            [it["vid_key"] for it in items], idxs)
