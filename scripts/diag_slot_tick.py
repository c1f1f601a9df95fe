"""On-chip ablation of the continuous-serving slot step (VERDICT r3 #5).

bench_all's transformer slot-decode row runs ~1.66 ms per micro-step at
R=512 (309k tokens/s, MFU 0.05) while its jaxpr-level traffic+compute
roofline is ~0.5 ms. Candidates: the 12 per-layer per-row cache scatters
(`ck.at[rows, :, i_vec, :].set(...)` — XLA TPU scatters can serialize), the
per-row mask/PE arithmetic, or plain small-matmul inefficiency.

This script times, on the real TPU, chained inside one jit each:
  full      the production make_slot_stepper step
  nowrite   the same step with the cache writes ablated (stale reads — wrong
            math, isolates the scatters' cost)
  maskwrite scatters replaced by one-hot masked full-cache rewrites (pure
            VPU elementwise; trades scatter latency for bandwidth)
  uniform   the batch stepper (make_cached_stepper) at the same rows — the
            dynamic_update_slice lower bound
  scatteronly  just the 12 scatters, nothing else

Run: python scripts/diag_slot_tick.py    (needs the tunnel; ~6 compiles)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcr_tpu.utils import backend_probe

_ok, _diag = backend_probe.ensure_backend()
if not _ok:
    print(f"backend unavailable: {_diag}", file=sys.stderr)
    sys.exit(2)

import jax
import jax.numpy as jnp

from vcr_tpu.models import base as mbase
from vcr_tpu.models import transformer as trm

R = int(__import__("os").environ.get("VCR_DIAG_ROWS", "512"))
ITERS = int(__import__("os").environ.get("VCR_DIAG_ITERS", "200"))


def timed(fn, *args):
    out = jax.jit(fn)
    np.asarray(out(*args))            # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(out(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    rng = np.random.default_rng(0)
    spec = mbase.ModelSpec(
        arch="transformer", vocab_size=9000, embed_size=300, hidden_size=512,
        vid_feat_size=4096, max_len=20, num_frames=30, dropout_p=0.0,
        sos_id=8996, compute_dtype="bfloat16", vocab_pad_to=128)
    params = jax.device_put(trm.init_params(
        jax.random.PRNGKey(0), spec,
        rng.standard_normal((9000, 300)).astype(np.float32)))
    feats = jnp.asarray(rng.standard_normal((R, spec.num_frames, 4096)),
                        jnp.float32).astype(jnp.bfloat16)

    # "full" = the SCATTER form, pinned explicitly (masked is the product
    # default since the r4 A/B; this script exists to keep measuring both)
    os.environ["VCR_SLOT_WRITE"] = "scatter"
    step_fn, init_self, cross_state = trm.make_slot_stepper(params, spec)
    os.environ.pop("VCR_SLOT_WRITE")
    eo = trm.encode(params, spec, feats, trm.create_masks_inp(feats),
                    jax.random.PRNGKey(0), train=False)
    st0 = {**init_self(R), **cross_state(eo)}
    st0 = jax.device_put(st0)
    words0 = jnp.full((R,), spec.sos_id, jnp.int32)
    ivec0 = jnp.asarray(rng.integers(0, spec.max_len - 1, (R,)), jnp.int32)

    def chain(body):
        def run(st, words, i_vec):
            def micro(carry, _):
                st, w, iv = carry
                st, logits = body(st, w, iv)
                w = jnp.argmax(logits, -1).astype(jnp.int32)
                iv = jnp.minimum(iv + 1, spec.max_len - 1)
                return (st, w, iv), None
            (st, w, _), _ = jax.lax.scan(micro, (st, words, i_vec), None,
                                         length=ITERS)
            return w.astype(jnp.float32).ravel()[0]
        return run

    t_full = timed(chain(step_fn), st0, words0, ivec0)
    print(f"scatter    {t_full*1e3:8.3f} ms/step  "
          f"{R/t_full/1e3:9.1f}k tokens/s")

    # the production default: masked-write mode (bitwise-identical —
    # tests/test_serving_continuous.py::test_masked_cache_write_bitwise)
    mstep_fn, _, _ = trm.make_slot_stepper(params, spec)
    t_m = timed(chain(mstep_fn), st0, words0, ivec0)
    print(f"prod-masked{t_m*1e3:8.3f} ms/step  {R/t_m/1e3:9.1f}k tokens/s")

    # int8 KV-cache tick at the same rows (the serving mode bench_all A/Bs)
    q_step, q_init, q_cross = trm.make_slot_stepper(params, spec,
                                                    kv_cache="int8")
    qst0 = jax.device_put({**q_init(R), **q_cross(eo)})
    t_q = timed(chain(q_step), qst0, words0, ivec0)
    print(f"int8-masked{t_q*1e3:8.3f} ms/step  {R/t_q/1e3:9.1f}k tokens/s")

    # ---- per-tick byte decomposition (VERDICT r4 #4) ---------------------
    # ANALYTIC per-tensor accounting instead of the XLA cost model: the cost
    # model over-counted a tick ~3x (1891.6 MB printed in the r5 capture vs
    # ~600 MB of tensors a tick can physically touch — it bills fused
    # reloads that stay in VMEM). Every term below is a real HBM stream the
    # tick cannot avoid: caches are read whole (and the masked-write form
    # REWRITES the self caches whole), decoder weights stream once per tick
    # regardless of R, logits leave at f32.
    PEAK_FLOPS, PEAK_BW = 197e12, 819e9          # TPU v5e bf16 / HBM
    heads_, l_, n_ = spec.tf_heads, spec.max_len, spec.num_frames
    hid_ = params["decoder"]["layers"]["attn_1"]["q"]["w"].shape[-1]
    dk_, nl_ = hid_ // heads_, spec.tf_layers
    pv_ = spec.padded_vocab_size
    d_ff = params["decoder"]["layers"]["ff"]["linear_1"]["w"].shape[-1]

    def byte_table(kv_bytes, label):
        selfrd = nl_ * 2 * R * heads_ * l_ * dk_ * kv_bytes
        selfwr = selfrd                      # masked form rewrites whole
        crossrd = nl_ * 2 * R * heads_ * n_ * dk_ * kv_bytes
        scales = (nl_ * 2 * R * heads_ * (l_ + n_) * 4 * 2
                  if kv_bytes == 1 else 0)   # f32 amax scales, rd+wr
        w_attn = nl_ * 2 * 4 * hid_ * hid_ * 2
        w_ff = nl_ * 2 * hid_ * d_ff * 2
        w_norm = nl_ * 3 * 2 * hid_ * 4 + 2 * hid_ * 4
        w_pred = hid_ * pv_ * 2
        w_emb = R * spec.embed_size * 4      # R gathered GloVe rows
        weights = w_attn + w_ff + w_norm + w_pred + w_emb
        logits = R * pv_ * 4
        acts = 12 * R * hid_ * 2             # residual stream hops (approx)
        total = selfrd + selfwr + crossrd + scales + weights + logits + acts
        print(f"  bytes/tick ({label}, masked write): "
              f"total={total/1e6:7.1f} MB -> HBM bound "
              f"{total/PEAK_BW*1e3:6.3f} ms")
        for nm, v in [("self-cache read", selfrd),
                      ("self-cache write", selfwr),
                      ("cross-cache read", crossrd),
                      ("int8 scales", scales),
                      ("decoder weights", weights),
                      ("f32 logits out", logits),
                      ("activations", acts)]:
            if v:
                print(f"    {nm:18s} {v/1e6:7.1f} MB  ({v/total:5.1%})")
        return total

    tot_bf = byte_table(2, "bf16 KV")
    tot_i8 = byte_table(1, "int8 KV")
    print(f"measured/analytic-bound: bf16 {t_m/(tot_bf/PEAK_BW):.2f}x  "
          f"int8 {t_q/(tot_i8/PEAK_BW):.2f}x")

    # ---- ablations: rebuild the step with modified cache-write behavior ---
    def make_variant(write_mode):
        dec = params["decoder"]
        layers = dec["layers"]
        heads, l, cdt = spec.tf_heads, spec.max_len, spec.cdtype
        hidden = layers["attn_1"]["q"]["w"].shape[-1]
        d_k = hidden // heads
        n_layers = spec.tf_layers
        per_layer = [jax.tree_util.tree_map(lambda a, i=i: a[i], layers)
                     for i in range(n_layers)]
        pos_row = jnp.arange(l)

        def heads_split(x):
            return x.reshape(x.shape[0], -1, heads, d_k).transpose(0, 2, 1, 3)

        from vcr_tpu.models.transformer import (_ff_apply, _pe_scale, dense,
                                                embed, mask_vocab_pad,
                                                torch_norm)

        def write(c, new, i_vec, rows_idx):
            if write_mode == "none":
                return c
            if write_mode == "scatter":
                return c.at[rows_idx, :, i_vec, :].set(new.astype(c.dtype))
            m = (pos_row[None, :] == i_vec[:, None])          # (R, L)
            m = m[:, None, :, None]
            return jnp.where(m, new.astype(c.dtype)[:, :, None, :], c)

        def attend_self(attn_p, x2, ck, cv, i_vec, rows_idx):
            q = heads_split(dense(attn_p["q"], x2, cdt))
            k_new = heads_split(dense(attn_p["k"], x2, cdt))[:, :, 0, :]
            v_new = heads_split(dense(attn_p["v"], x2, cdt))[:, :, 0, :]
            ck = write(ck, k_new, i_vec, rows_idx)
            cv = write(cv, v_new, i_vec, rows_idx)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                ck.astype(cdt),
                                preferred_element_type=jnp.float32) / (d_k ** 0.5)
            mask = pos_row[None, None, None, :] > i_vec[:, None, None, None]
            w = jax.nn.softmax(jnp.where(mask, -1e9, scores), axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cdt), cv.astype(cdt),
                             preferred_element_type=jnp.float32)
            out = ctx.transpose(0, 2, 1, 3).reshape(x2.shape[0], 1, hidden)
            return dense(attn_p["out"], out, cdt), ck, cv

        def attend_cross(attn_p, x2, k, v):
            q = heads_split(dense(attn_p["q"], x2, cdt))
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                k.astype(cdt),
                                preferred_element_type=jnp.float32) / (d_k ** 0.5)
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cdt), v.astype(cdt),
                             preferred_element_type=jnp.float32)
            out = ctx.transpose(0, 2, 1, 3).reshape(x2.shape[0], 1, hidden)
            return dense(attn_p["out"], out, cdt)

        def step(state, words, i_vec):
            rows_idx = jnp.arange(words.shape[0])
            x = embed(dec["embedding"], words)[:, None, :]
            x = (x * _pe_scale(i_vec + 1)[:, None, None]
                 + dec["pe"][i_vec][:, None, :])
            new_state = dict(state)
            for li in range(n_layers):
                lp = per_layer[li]
                kx, vx = state[f"x{li}"]
                ck, cv = state[f"c{li}"]
                x2 = torch_norm(lp["norm_1"], x)
                a, ck, cv = attend_self(lp["attn_1"], x2, ck, cv, i_vec,
                                        rows_idx)
                x = x + a
                x2 = torch_norm(lp["norm_2"], x)
                x = x + attend_cross(lp["attn_2"], x2, kx, vx)
                x2 = torch_norm(lp["norm_3"], x)
                x = x + _ff_apply(lp["ff"], x2, None, False, cdt)
                new_state[f"c{li}"] = (ck, cv)
            h = torch_norm(dec["norm_out"], x)[:, 0]
            logits = mask_vocab_pad(dense(dec["pred_linear"], h, cdt),
                                    spec.vocab_size)
            return new_state, logits

        return step

    for mode, label in [("none", "nowrite"), ("mask", "maskwrite"),
                        ("scatter", "rebuilt-scatter")]:
        t = timed(chain(make_variant(mode)), st0, words0, ivec0)
        print(f"{label:10s} {t*1e3:8.3f} ms/step  "
              f"{R/t/1e3:9.1f}k tokens/s")

    # ---- the uniform-position batch stepper at the same rows --------------
    bstep, binit = trm.make_cached_stepper(params, spec, eo)
    bst0 = jax.device_put(binit)

    def brun(st, words):
        def micro(carry, i):
            st, w = carry
            st, logits = bstep(st, w, i % spec.max_len)
            return (st, jnp.argmax(logits, -1).astype(jnp.int32)), None
        (st, w), _ = jax.lax.scan(micro, (st, words), jnp.arange(ITERS))
        return w.astype(jnp.float32).ravel()[0]

    tb = timed(brun, bst0, words0)
    print(f"uniform    {tb*1e3:8.3f} ms/step  {R/tb/1e3:9.1f}k tokens/s"
          "   (make_cached_stepper lower bound)")

    # ---- scatter-only microbench ------------------------------------------
    caches = [jnp.zeros((R, spec.tf_heads, spec.max_len, 64), jnp.bfloat16)
              for _ in range(12)]
    news = [jnp.asarray(rng.standard_normal((R, spec.tf_heads, 64)),
                        jnp.float32).astype(jnp.bfloat16) for _ in range(12)]

    def scat(caches, news, i_vec):
        rows_idx = jnp.arange(R)
        def micro(carry, _):
            cs, iv = carry
            cs = [c.at[rows_idx, :, iv, :].set(n) for c, n in zip(cs, news)]
            iv = jnp.minimum(iv + 1, spec.max_len - 1)
            return (cs, iv), None
        (cs, _), _ = jax.lax.scan(micro, (caches, i_vec), None, length=ITERS)
        return cs[0].astype(jnp.float32).ravel()[0]

    ts = timed(scat, caches, news, ivec0)
    print(f"scatteronly{ts*1e3:8.3f} ms/step   (12 per-row-position scatters)")


if __name__ == "__main__":
    main()
