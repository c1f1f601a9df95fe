"""Op-level on-chip bisect of the lineage-vs-gather beam divergence.

Round-4 forensics (onchip_r4/tpu_checks.log) show: step-0 logits bit-identical
(the exact score select works), steps >=1 diverge at bf16-quantum scale
(~1e-2) once ancestry reads mix cache rows. Hypotheses:

  H1  the two Q.K score dot SHAPES round differently at f32 ulp on this
      hardware (gather path: "bhqd,bhkd->bhqk" with M=1; lineage:
      "bthd,bshjd->bthjs" with M=K), and the ulp gets amplified to a
      bf16-quantum flip at the next astype(bf16) cast;
  H2  the ctx contraction association differs (contraction over j vs (j,s)
      with interleaved exact zeros is NOT carried sequentially on the MXU).

This script measures both in isolation on identical data and prints maxdiffs
for every candidate formulation, so one run picks the fix:

  python scripts/diag_lineage.py          # on the real TPU
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcr_tpu.utils import backend_probe

_ok, _diag = backend_probe.ensure_backend()
if not _ok:
    print(f"backend unavailable: {_diag}", file=sys.stderr)
    sys.exit(2)

import jax
import jax.numpy as jnp


def md(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).max())


def main():
    rng = np.random.default_rng(0)
    b, k, h, l, d = 8, 5, 8, 12, 64
    rows = b * k
    cdt = jnp.bfloat16

    q = jnp.asarray(rng.standard_normal((b, k, h, d)), jnp.float32).astype(cdt)
    kc = jnp.asarray(rng.standard_normal((b, k, h, l, d)),
                     jnp.float32).astype(cdt)   # (b, s, h, j, d) cache block
    vc = jnp.asarray(rng.standard_normal((b, k, h, l, d)),
                     jnp.float32).astype(cdt)
    anc = jnp.asarray(rng.integers(0, k, (b, k, l)), jnp.int32)
    w32 = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, k, h, l)), jnp.float32), -1)

    # ---------------- H1: Q.K dot-shape equivalence --------------------
    @jax.jit
    def scores_lineage_shape(q, kc):
        # the lineage einsum, all k source rows
        return jnp.einsum("bthd,bshjd->bthjs", q, kc,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def scores_gather_shape(q, kc):
        # the gather-path einsum: per-row q against its OWN row's cache
        qr = q.reshape(rows, h, 1, d)
        kr = kc.reshape(rows, h, l, d)
        return jnp.einsum("bhqd,bhkd->bhqk", qr, kr,
                          preferred_element_type=jnp.float32)

    s_all = np.asarray(scores_lineage_shape(q, kc))      # (b,t,h,j,s)
    s_gat = np.asarray(scores_gather_shape(q, kc))       # (rows,h,1,l)
    # diagonal s=t of the lineage tensor must equal the gather rows
    diag = s_all[np.arange(b)[:, None], np.arange(k)[None, :], :, :,
                 np.arange(k)[None, :]]
    # fancy-index result: (b, k, h, j) -> rows
    diag = diag.reshape(rows, h, l)
    print(f"H1 qk dot shape: max|lineage_diag - gather| = "
          f"{md(diag, s_gat[:, :, 0, :]):.3e}   (0 => shapes agree bitwise)")

    # ---------------- H2: ctx contraction equivalence ------------------
    onehot = jax.nn.one_hot(anc, k, dtype=jnp.float32)   # (b,t,j,s)
    wb = w32.astype(cdt)

    @jax.jit
    def ctx_lineage(w32, vc, onehot):
        wm = (w32[..., None] * onehot[:, :, None, :, :]).astype(cdt)
        return jnp.einsum("bthjs,bshjd->bthd", wm, vc,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def ctx_selected(wb, vc, anc):
        # physically gather the ancestry rows, then the gather-path dot
        idx = anc[:, :, None, :, None]                   # (b,t,1,j,1)
        vsel = jnp.take_along_axis(vc[:, None], idx[:, :, :, None],
                                   axis=1)
        # vc[:,None]: (b,1,s,h,j,d); idx[:,:,:,None]: (b,t,1,1,j,1) over s
        vsel = vsel[:, :, 0]                             # (b,t,h,j,d)
        wr = wb.reshape(rows, h, 1, l)
        vr = vsel.reshape(rows, h, l, d)
        return jnp.einsum("bhqk,bhkd->bhqd", wr, vr,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def ctx_gather_identity(wb, vc):
        # the gather path on an identity ancestry (vc already "reordered")
        wr = wb.reshape(rows, h, 1, l)
        vr = vc.reshape(rows, h, l, d)
        return jnp.einsum("bhqk,bhkd->bhqd", wr, vr,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def ctx_lineage_identity(w32, vc):
        eye = jnp.tile(jnp.eye(k, dtype=jnp.float32)[None, :, None, :],
                       (b, 1, l, 1))                      # (b,t,j,s) identity
        wm = (w32[..., None] * eye[:, :, None, :, :]).astype(cdt)
        return jnp.einsum("bthjs,bshjd->bthd", wm, vc,
                          preferred_element_type=jnp.float32)

    c_lin_id = ctx_lineage_identity(w32, vc)
    c_gat_id = ctx_gather_identity(wb, vc)
    print(f"H2a ctx IDENTITY ancestry: max|lineage - gather| = "
          f"{md(np.asarray(c_lin_id).reshape(rows, h, d), np.asarray(c_gat_id)[:, :, 0, :]):.3e}"
          "   (0 => zero-interleaved accumulation is exact)")

    c_lin = ctx_lineage(w32, vc, onehot)
    c_sel = ctx_selected(wb, vc, anc)
    print(f"H2b ctx MIXED ancestry: max|lineage - selected-read| = "
          f"{md(np.asarray(c_lin).reshape(rows, h, d), np.asarray(c_sel)[:, :, 0, :]):.3e}"
          "   (0 => the einsum-through-onehot ctx is exact too)")

    # selected-read vs a true physical reorder (ground truth construction)
    vre = np.zeros((b, k, h, l, d), np.float32)
    vnp = np.asarray(vc, np.float32)
    anp = np.asarray(anc)
    for bi in range(b):
        for t in range(k):
            for j in range(l):
                vre[bi, t, :, j, :] = vnp[bi, anp[bi, t, j], :, j, :]
    c_phys = ctx_gather_identity(wb, jnp.asarray(vre).astype(cdt))
    print(f"H2c ctx selected-read vs physical reorder = "
          f"{md(np.asarray(c_sel), np.asarray(c_phys)):.3e}"
          "   (0 => take_along_axis + same dot is bit-exact)")

    # scores select path for completeness (should be 0 after round-4 fix)
    sel = np.take_along_axis(
        s_all, np.asarray(anc)[:, :, None, :, None], axis=-1)[..., 0]
    want = np.zeros((b, k, h, l), np.float32)
    for bi in range(b):
        for t in range(k):
            for j in range(l):
                want[bi, t, :, j] = s_all[bi, t, :, j, anp[bi, t, j]]
    print(f"S  exact score select sanity = {md(sel, want):.3e}")


if __name__ == "__main__":
    main()
