"""Compiled-mode (non-interpret) Pallas kernel parity on REAL TPU hardware.

The pytest suite runs on a virtual CPU mesh where the kernels auto-fall-back
to interpret mode (ops/pallas_gru._resolved_interpret); this script is the
compiled-mode counterpart, run manually or by CI on a machine with a TPU:

    python tpu_checks.py

Checks every kernel (GRU fwd, GRU grad, LSTM both directions, BiLSTM) against
the pure-JAX scan at fp32 and exits nonzero on any mismatch.
"""

import os
import sys

from vcr_tpu.utils import backend_probe

# Probe before importing jax: a dead axon tunnel hangs on first device use
# (VERDICT.md round-2 post-mortem), so fail fast with a diagnostic instead.
_ok, _diag = backend_probe.ensure_backend()
if not _ok:
    print(f"TPU backend unavailable after retries: {_diag}", file=sys.stderr)
    sys.exit(2)

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.nn import rnn
from vcr_tpu.ops import pallas_gru as pg


def check(name, got, want, atol=5e-4, rtol=2e-3):
    """TPU fp32 matmuls run in bf16-ish passes by default, and the pallas
    kernel's in-kernel dot and XLA's scan matmul round differently — ~1e-4
    absolute differences are hardware-expected (CLAUDE.md: fp32-exact parity
    checks must run on CPU). These tolerances catch real math errors (gate
    order, indexing, tiling) without tripping on precision."""
    got, want = np.asarray(got), np.asarray(want)
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{'PASS' if ok else 'FAIL'}  {name}  maxdiff={np.abs(got - want).max():.2e}")
    return ok


def dump_token_mismatch(name_a, tok_a, name_b, tok_b, scores_a=None,
                        scores_b=None):
    """Forensics for a failed token-identity check (VERDICT r3 #2): print the
    first divergent coordinate, both full token rows there, the mismatch
    count, and (if given) both beam score vectors — so one unattended capture
    through a flaky tunnel is enough to diagnose the failure."""
    ta, tb = np.asarray(tok_a), np.asarray(tok_b)
    div = np.argwhere(ta != tb)
    first = tuple(int(v) for v in div[0])
    print(f"  FORENSICS: {div.shape[0]}/{ta.size} cells differ; "
          f"first at index {first}")
    r = first[0]
    print(f"    {name_a}[{r}] = {ta[r].tolist()}")
    print(f"    {name_b}[{r}] = {tb[r].tolist()}")
    if scores_a is not None and scores_b is not None:
        sa, sb = np.asarray(scores_a, np.float64), np.asarray(scores_b,
                                                              np.float64)
        print(f"    beam scores {name_a}[{r}] = {sa[r].tolist()}")
        print(f"    beam scores {name_b}[{r}] = {sb[r].tolist()}")
        print(f"    max |score gap| = {np.abs(sa - sb).max():.3e}")


def lineage_stepper_probe(params, spec, e_outputs, beam_size, rng):
    """Lockstep stepper forensics: drive the lineage and gather steppers with
    IDENTICAL token inputs and an IDENTICAL per-step within-item reorder
    schedule, and print the per-step max |logit diff|. Separates 'the stepper
    math diverges on this hardware' (nonzero from some step N on) from 'the
    steppers agree and the divergence is a beam near-tie'. Returns the max
    lockstep logit gap across steps (the envelope the check bounds)."""
    from vcr_tpu.models import transformer as trm

    b = e_outputs.shape[0]
    rows = b * beam_size
    step_l, st_l, reorder_l = trm.make_cached_stepper(
        params, spec, e_outputs, beam_tile=beam_size, lineage=True)
    step_g, st_g = trm.make_cached_stepper(params, spec, e_outputs,
                                           beam_tile=beam_size)
    jstep_l = jax.jit(step_l)
    jstep_g = jax.jit(step_g)
    gather_state = jax.jit(
        lambda s, idx: jax.tree_util.tree_map(lambda v: v[idx], s))
    first_bad = None
    max_gap = 0.0
    for i in range(spec.max_len):
        words = jnp.asarray(rng.integers(0, spec.vocab_size, (rows,)),
                            jnp.int32)
        if i > 0:  # step 0 has nothing to reorder
            src = rng.integers(0, beam_size, (b, beam_size))
            flat = jnp.asarray(
                (np.arange(b)[:, None] * beam_size + src).reshape(-1),
                jnp.int32)
            st_l = reorder_l(st_l, flat)
            st_g = gather_state(st_g, flat)
        st_l, lg_l = jstep_l(st_l, words, i)
        st_g, lg_g = jstep_g(st_g, words, i)
        lg_l, lg_g = np.asarray(lg_l, np.float64), np.asarray(lg_g, np.float64)
        d = np.abs(lg_l - lg_g).max()
        am_differs = int((lg_l.argmax(-1) != lg_g.argmax(-1)).sum())
        print(f"    step {i:2d}: max|logit diff|={d:.3e}  "
              f"argmax flips={am_differs}/{rows}")
        max_gap = max(max_gap, float(d))
        if d > 0 and first_bad is None:
            first_bad = i
    print("    stepper verdict: "
          + ("logits bit-identical under lockstep — divergence is "
             "beam-selection near-ties" if first_bad is None else
             f"stepper math first diverges at step {first_bad}"))
    return max_gap


def main() -> int:
    # VCR_CHECKS_FORCE=1 runs the whole pass on whatever backend is live —
    # a CPU dry-run of the check harness itself (kernels go interpret-mode).
    if (jax.default_backend() != "tpu"
            and os.environ.get("VCR_CHECKS_FORCE") != "1"):
        print(f"not on TPU (backend={jax.default_backend()}) — kernels would "
              "run in interpret mode; nothing to check here")
        return 0
    rng = np.random.default_rng(0)
    t, b, i, h = 12, 256, 64, 512
    ok = True

    gp = rnn.gru_init(jax.random.PRNGKey(0), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)), jnp.float32)
    ref = rnn.gru_sequence(gp, xs, compute_dtype=jnp.float32)
    got = jax.jit(lambda p, x: pg.gru_sequence_pallas(
        p, x, compute_dtype=jnp.float32))(gp, xs)
    ok &= check("gru fwd outs", got[0], ref[0])
    ok &= check("gru fwd h_last", got[1], ref[1])

    g_pal = jax.jit(jax.grad(lambda p, x: jnp.sum(pg.gru_sequence_pallas(
        p, x, compute_dtype=jnp.float32)[0] ** 2)))(gp, xs)
    g_ref = jax.jit(jax.grad(lambda p, x: jnp.sum(rnn.gru_sequence(
        p, x, compute_dtype=jnp.float32)[0] ** 2)))(gp, xs)
    for k in g_ref:
        ok &= check(f"gru grad {k}", g_pal[k], g_ref[k], atol=5e-2, rtol=5e-3)

    lp = rnn.lstm_init(jax.random.PRNGKey(1), i, h)
    for rev in (False, True):
        r_outs, (r_h, r_c) = rnn.lstm_sequence(lp, xs, reverse=rev,
                                               compute_dtype=jnp.float32)
        p_outs, (p_h, p_c) = jax.jit(lambda p, x, rv=rev: pg.lstm_sequence_pallas(
            p, x, reverse=rv, compute_dtype=jnp.float32))(lp, xs)
        ok &= check(f"lstm rev={rev} outs", p_outs, r_outs)
        ok &= check(f"lstm rev={rev} c_last", p_c, r_c)

    bp = rnn.bilstm_init(jax.random.PRNGKey(2), i, h)
    ok &= check("bilstm outs",
                jax.jit(lambda p, x: pg.bilstm_sequence_pallas(
                    p, x, compute_dtype=jnp.float32))(bp, xs),
                rnn.bilstm_sequence(bp, xs, compute_dtype=jnp.float32))

    # Round-4 lineage contract (VERDICT r3 #1, resolved by decomposition —
    # see PARITY.md "lineage beam numerics"):
    #
    #  (a) REQUIRED, bit-exact: the lineage ANCESTRY BOOKKEEPING. The same
    #      lineage stepper, driven once with ancestry-only reorders (product
    #      path) and once with physically permuted caches + identity ancestry
    #      (textbook-bookkeeping oracle), must emit bit-identical tokens AND
    #      scores when compiled on the MXU at the bf16 serving spec. This is
    #      the part of the design that could actually be WRONG; round 4 made
    #      it provable by gathering the context V rows through the ancestry
    #      (ancestry-independent reduction order, _lineage_gather_rows).
    #  (b) ENVELOPE, not identity: lineage vs the gather-path beam. Their
    #      attention dots have different SHAPES (`bthjs` vs `bhqk`); two
    #      different contractions are never bit-equal on the MXU, and f32-ulp
    #      gaps amplify to one-bf16-quantum logit gaps at the next cast
    #      (onchip_r4 forensics). Tokens may legitimately differ on near-ties,
    #      so the serving default is the gather path (decode.py); this row
    #      bounds the lockstep per-step logit gap instead of demanding token
    #      identity.
    from vcr_tpu import decode as vdecode
    from vcr_tpu.models import base as mbase, transformer

    tspec = mbase.ModelSpec(
        arch="transformer", vocab_size=512, embed_size=300, hidden_size=512,
        vid_feat_size=4096, max_len=12, num_frames=8, dropout_p=0.0,
        sos_id=508, compute_dtype="bfloat16", vocab_pad_to=128)
    tparams = jax.device_put(transformer.init_params(
        jax.random.PRNGKey(3), tspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    tx = jnp.asarray(rng.standard_normal((8, 8, 4096)), jnp.float32
                     ).astype(jnp.bfloat16)

    # (a) bookkeeping bit-identity, compiled
    te_out = transformer.encode(tparams, tspec, tx,
                                transformer.create_masks_inp(tx),
                                jax.random.PRNGKey(0), train=False)
    tstep, tinit, treorder = transformer.make_cached_stepper(
        tparams, tspec, te_out, beam_tile=5, lineage=True)
    trows = te_out.shape[0] * 5
    anc_id = jnp.tile((jnp.arange(trows, dtype=jnp.int32) % 5)[:, None],
                      (1, tspec.max_len))

    def phys_reorder(state, flat_src):
        out = {k_: jax.tree_util.tree_map(lambda x: x[flat_src], v)
               for k_, v in state.items() if k_ != "anc"}
        out["anc"] = anc_id
        return out

    run_anc = jax.jit(lambda st: vdecode.beam_search(
        tstep, st, te_out.shape[0], 5, tspec.max_len, tspec.sos_id, 509,
        reorder_fn=treorder))
    run_phy = jax.jit(lambda st: vdecode.beam_search(
        tstep, st, te_out.shape[0], 5, tspec.max_len, tspec.sos_id, 509,
        reorder_fn=phys_reorder))
    tok_a, sc_a = run_anc(tinit)
    tok_p, sc_p = run_phy(tinit)
    bk_ok = bool(np.array_equal(np.asarray(tok_a), np.asarray(tok_p))
                 and np.array_equal(np.asarray(sc_a), np.asarray(sc_p)))
    print(f"{'PASS' if bk_ok else 'FAIL'}  lineage bookkeeping ≡ physical "
          "reorder (compiled, bf16, bit-exact)")
    if not bk_ok:
        dump_token_mismatch("ancestry", tok_a, "physical", tok_p, sc_a, sc_p)
    ok &= bk_ok

    # (b) lineage-vs-gather numerics envelope: lockstep steppers, identical
    # inputs and reorder schedule; per-step logit gap must stay within a few
    # bf16 quanta (a real math error would be O(1)+). Token flips on
    # near-ties are expected and reported, not failed.
    tok_lineage, sc_lineage = jax.jit(
        lambda p, x: vdecode.transformer_beam_decode_fast(
            p, tspec, x, beam_size=5, eos_id=509, lineage=True))(tparams, tx)
    tok_gather, sc_gather = jax.jit(
        lambda p, x: vdecode.transformer_beam_decode_fast(
            p, tspec, x, beam_size=5, eos_id=509, lineage=False))(tparams, tx)
    flips = int((np.asarray(tok_lineage) != np.asarray(tok_gather)).sum())
    print(f"    info: lineage-vs-gather token cells differing: "
          f"{flips}/{np.asarray(tok_lineage).size} (near-tie flips expected)")
    env_gap = lineage_stepper_probe(tparams, tspec, te_out, 5,
                                    np.random.default_rng(42))
    env_ok = env_gap < 0.5
    print(f"{'PASS' if env_ok else 'FAIL'}  lineage vs gather stepper "
          f"envelope (compiled, max lockstep logit gap {env_gap:.3e} < 0.5)")
    ok &= env_ok

    # Round-3 deployment artifact: a cpu+tpu StableHLO serving export
    # (vcr_tpu/export_serving.py) must replay token-identically on the real
    # chip (the suite proves the cpu lowering; this is the tpu lowering's
    # only execution path).
    import tempfile

    from vcr_tpu import export_serving, serving
    from vcr_tpu.models import s2vt

    sspec = mbase.ModelSpec(
        arch="s2vt", vocab_size=512, embed_size=300, hidden_size=512,
        vid_feat_size=512, max_len=12, num_frames=8, dropout_p=0.0,
        sos_id=508, compute_dtype="bfloat16", vocab_pad_to=128)
    sparams = s2vt.init_params(
        jax.random.PRNGKey(4), sspec,
        rng.standard_normal((512, 300)).astype(np.float32))
    with tempfile.TemporaryDirectory() as td:
        export_serving.export_captioner(sparams, sspec, td, eos_id=509,
                                        platforms=("cpu", "tpu"))
        art = export_serving.load_artifact(td)
        sx = rng.standard_normal((4, 8, 512)).astype(np.float32)
        live = serving.build_captioner(sparams, sspec, "none", eos_id=509)
        same = bool(np.array_equal(art.caption(sx),
                                   np.asarray(live(jnp.asarray(sx)))))
    print(f"{'PASS' if same else 'FAIL'}  serving artifact replay (tpu lowering)")
    ok &= same

    # Round-3 training path: the hoisted teacher-forced decode (vocab
    # projection moved out of the scan, models/s2vt.py) must match the
    # general in-scan path when COMPILED on real hardware. The suite proves
    # bit-identity eagerly on CPU; on-chip the two programs may tile the
    # (L·B, H) vs per-step (B, H) matmuls differently, so compare at fp32
    # with the standard hardware tolerance.
    hspec = mbase.ModelSpec(
        arch="s2vt", vocab_size=512, embed_size=300, hidden_size=512,
        vid_feat_size=512, max_len=12, num_frames=8, dropout_p=0.2,
        sos_id=508, compute_dtype="float32", vocab_pad_to=128)
    hparams = jax.device_put(s2vt.init_params(
        jax.random.PRNGKey(5), hspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    hx = jnp.asarray(rng.standard_normal((16, 8, 512)), jnp.float32)
    hs = jnp.asarray(rng.integers(0, 512, (16, 12)), jnp.int32)
    hkey = jax.random.PRNGKey(6)
    hoisted = jax.jit(lambda p, x, s_, k: s2vt.apply(
        p, hspec, x, s_, rng=k, train=True, teacher_force_prob=1.0))(
            hparams, hx, hs, hkey)
    general = jax.jit(lambda p, x, s_, k, tf: s2vt.apply(
        p, hspec, x, s_, rng=k, train=True, teacher_force_prob=tf))(
            hparams, hx, hs, hkey, jnp.float32(1.0))
    ok &= check("hoisted decode ≡ general decode (compiled)", hoisted, general)

    # Round-3 serving path: continuous-batching slot decode compiled on real
    # hardware must reproduce the batch greedy rollout (truncated at eos) —
    # the per-slot-position transformer stepper's scatter writes and per-row
    # masks, and the GRU slot pool's admission scatter, both exercise
    # TPU-compiled paths the CPU suite only proves eagerly.
    from vcr_tpu.serving_continuous import ContinuousCaptioner
    from vcr_tpu.models import transformer as trm

    cspec = mbase.ModelSpec(
        arch="transformer", vocab_size=512, embed_size=300, hidden_size=512,
        vid_feat_size=4096, max_len=10, num_frames=8, dropout_p=0.0,
        sos_id=508, compute_dtype="float32", tf_layers=2, tf_heads=4)
    cparams = jax.device_put(trm.init_params(
        jax.random.PRNGKey(7), cspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    cfeats = rng.standard_normal((6, 8, 4096)).astype(np.float32)
    fast = np.asarray(trm.decode_greedy_fast(cparams, cspec, trm.encode(
        cparams, cspec, jnp.asarray(cfeats), trm.create_masks_inp(cfeats),
        jax.random.PRNGKey(0), train=False)))
    cc = ContinuousCaptioner(cparams, cspec, slots=3, admit_chunk=2,
                             step_chunk=3, eos_id=509)
    got_cc = cc.caption_all({i: cfeats[i] for i in range(6)})
    cc_ok = True
    for i in range(6):
        row = fast[i]
        hits = np.nonzero(row == 509)[0]
        want_row = row[: hits[0] + 1] if len(hits) else row
        row_ok = np.array_equal(got_cc[i], want_row)
        if not row_ok:
            print(f"  FORENSICS: key {i}: continuous={np.asarray(got_cc[i]).tolist()}"
                  f" vs greedy={np.asarray(want_row).tolist()}")
        cc_ok &= row_ok
    print(f"{'PASS' if cc_ok else 'FAIL'}  continuous serving ≡ fast greedy (compiled)")
    ok &= cc_ok

    # Round-4 int8 KV-cache serving mode compiled on the MXU: the quantized
    # pool must serve every request, its compiled logits must sit inside a
    # small envelope of the bf16-cache stepper (bounded quantization error,
    # NOT bit-identity — ops/kvquant.py), and the masked-vs-scatter write
    # forms must agree within a quantization quantum. Masked-vs-scatter is
    # NOT required to be bit-identical compiled: the first r4c capture
    # measured exactly that failure (served_ok=True, envelope 0.025, but
    # masked==scatter=False) — the two write forms are two different
    # PROGRAMS, and XLA fuses the quantization arithmetic (amax, 1/scale,
    # round) differently in each, which can flip a code on an exact
    # rounding tie. Same lesson as the lineage contract: only identical ops
    # on identical operands are bit-equal, and fusion context changes the
    # ops. Eager bit-identity stays proven on CPU
    # (tests/test_kv_quant.py::test_int8_masked_scatter_bitwise); compiled,
    # we bound the cross-program gap and report which side (codes / scales /
    # read fusion) moved.
    cc8 = ContinuousCaptioner(cparams, cspec, slots=3, admit_chunk=2,
                              step_chunk=3, eos_id=509, kv_cache="int8")
    got8 = cc8.caption_all({i: cfeats[i] for i in range(6)})
    q_ok = set(got8) == set(range(6)) and all(
        1 <= len(np.asarray(t)) <= cspec.max_len for t in got8.values())
    ceo = trm.encode(cparams, cspec, jnp.asarray(cfeats),
                     trm.create_masks_inp(cfeats), jax.random.PRNGKey(0),
                     train=False)
    env_gap, wq_gap = 0.0, 0.0
    outs = {}
    for wmode in ("masked", "scatter"):
        os.environ["VCR_SLOT_WRITE"] = wmode
        try:
            qstep, qinit, qcross = trm.make_slot_stepper(cparams, cspec,
                                                         kv_cache="int8")
            fstep, finit, fcross = trm.make_slot_stepper(cparams, cspec)
        finally:
            os.environ.pop("VCR_SLOT_WRITE", None)

        @jax.jit
        def lockstep(params, eo):
            stq = {**qinit(eo.shape[0]), **qcross(eo)}
            stf = {**finit(eo.shape[0]), **fcross(eo)}
            w = jnp.full((eo.shape[0],), cspec.sos_id, jnp.int32)

            def body(carry, i):
                stq, stf, w = carry
                iv = jnp.full((eo.shape[0],), i, jnp.int32)
                stq, lq = qstep(stq, w, iv)
                stf, lf = fstep(stf, w, iv)
                gap = jnp.max(jnp.abs(lq.astype(jnp.float32)
                                      - lf.astype(jnp.float32)))
                w = jnp.argmax(lf, -1).astype(jnp.int32)
                return (stq, stf, w), (gap, lq)

            (stq, _, _), (gaps, lqs) = jax.lax.scan(body, (stq, stf, w),
                                                    jnp.arange(cspec.max_len))
            return jnp.max(gaps), lqs, stq

        gap, lqs, stq = lockstep(cparams, ceo)
        env_gap = max(env_gap, float(gap))
        outs[wmode] = (np.asarray(lqs), jax.device_get(stq))
    lq_m, st_m = outs["masked"]
    lq_s, st_s = outs["scatter"]
    wq_gap = float(np.max(np.abs(lq_m - lq_s)))
    # isolate WHERE the two programs diverge: quantized codes (write-side
    # fusion of amax/1/scale/round), scales, or only the read-side folds
    code_gap = scale_gap = 0.0
    for leaf_m, leaf_s in zip(jax.tree_util.tree_leaves(st_m),
                              jax.tree_util.tree_leaves(st_s)):
        d = float(np.max(np.abs(np.asarray(leaf_m, np.float32)
                                - np.asarray(leaf_s, np.float32))))
        if np.asarray(leaf_m).dtype == np.int8:
            code_gap = max(code_gap, d)
        else:
            scale_gap = max(scale_gap, d)
    q8_ok = q_ok and env_gap < 0.5 and wq_gap < 0.05
    if not q8_ok or wq_gap > 0:
        print(f"  FORENSICS: served_ok={q_ok} envelope={env_gap:.4f} "
              f"masked-vs-scatter logit gap={wq_gap:.2e} "
              f"code gap={code_gap:.0f} scale gap={scale_gap:.2e}")
    print(f"{'PASS' if q8_ok else 'FAIL'}  int8 KV-cache pool (compiled: "
          f"serves + bf16 envelope {env_gap:.3f} < 0.5 + write-mode gap "
          f"{wq_gap:.2e} < 0.05)")
    ok &= q8_ok

    # ... and the continuous BEAM pool vs the batch beam's best row (GRU
    # family: exercises the per-slot top-k + within-slot reorder compiled)
    from vcr_tpu.decode import decode_tokens
    from vcr_tpu.models import s2vt as s2vt_mod

    bspec = mbase.ModelSpec(
        arch="s2vt", vocab_size=512, embed_size=300, hidden_size=256,
        vid_feat_size=512, max_len=10, num_frames=8, dropout_p=0.0,
        sos_id=508, compute_dtype="float32")
    bparams = jax.device_put(s2vt_mod.init_params(
        jax.random.PRNGKey(8), bspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    bfeats = rng.standard_normal((5, 8, 512)).astype(np.float32)
    btoks, _ = decode_tokens(bparams, bspec, jnp.asarray(bfeats), 509,
                             beam_size=3)
    brows = np.asarray(btoks)[:, 0]
    bcc = ContinuousCaptioner(bparams, bspec, slots=2, admit_chunk=1,
                              step_chunk=2, eos_id=509, beam_size=3)
    got_b = bcc.caption_all({i: bfeats[i] for i in range(5)})
    cb_ok = True
    for i in range(5):
        row = brows[i]
        hits = np.nonzero(row == 509)[0]
        want_row = row[: hits[0] + 1] if len(hits) else row
        row_ok = np.array_equal(got_b[i], want_row)
        if not row_ok:
            print(f"  FORENSICS: key {i}: continuous={np.asarray(got_b[i]).tolist()}"
                  f" vs batch-beam={np.asarray(want_row).tolist()}")
        cb_ok &= row_ok
    print(f"{'PASS' if cb_ok else 'FAIL'}  continuous beam ≡ batch beam (compiled)")
    ok &= cb_ok

    # ... and the per-request-sampling pool + cancellation, compiled: rows
    # carrying the greedy default (T=1, top_k=1) through the row-wise
    # sampling filters must STILL equal the batch greedy rollout (the
    # sampling step path's sorts/softmax/categorical are exercised on the
    # chip), one hot row must produce a valid caption, and a mid-stream
    # release_slots must free capacity without perturbing other slots.
    sgt, _ = decode_tokens(bparams, bspec, jnp.asarray(bfeats), 509,
                           beam_size=1)
    sgrows = np.asarray(sgt)[:, 0]
    scc = ContinuousCaptioner(bparams, bspec, slots=2, admit_chunk=1,
                              step_chunk=2, eos_id=509,
                              request_sampling=True,
                              rng=jax.random.PRNGKey(9))

    def s_reqs():
        yield 0, bfeats[0], {"top_k": 1}
        yield 1, bfeats[1], {"top_k": 1}
        yield "hot", bfeats[2], {"temperature": 4.0, "top_p": 0.9}
        yield 3, bfeats[3], {"top_k": 1}

    def s_cancel(outstanding):
        return {3} & outstanding       # cancel key 3 whenever visible

    got_s = dict(scc.caption_stream(s_reqs(), poll_cancelled=s_cancel))
    cs_ok = 3 not in got_s and scc.stats["cancelled"] == 1
    if not cs_ok:
        print(f"  FORENSICS: cancel: 3 in results={3 in got_s}, "
              f"stats={scc.stats}")
    hot_ok = "hot" in got_s and 1 <= len(got_s["hot"]) <= bspec.max_len
    if not hot_ok:
        print(f"  FORENSICS: hot row: present={'hot' in got_s}, "
              f"value={got_s.get('hot')}")
    cs_ok &= hot_ok
    for i in (0, 1):
        row = sgrows[i]
        hits = np.nonzero(row == 509)[0]
        want_row = row[: hits[0] + 1] if len(hits) else row
        row_ok = np.array_equal(got_s[i], want_row)
        if not row_ok:
            print(f"  FORENSICS: key {i}: sampled-greedy="
                  f"{np.asarray(got_s[i]).tolist()} vs "
                  f"greedy={np.asarray(want_row).tolist()}")
        cs_ok &= row_ok
    print(f"{'PASS' if cs_ok else 'FAIL'}  per-request sampling + cancel (compiled)")
    ok &= cs_ok

    # ------------------------------------------------------------------
    # Round-5 rows: every compiled surface that landed after the last
    # on-chip ALL PASS (VERDICT r4 #1). Each row covers ONE post-r4d
    # source change on the real MXU.
    # ------------------------------------------------------------------

    # (R5-1) bf16 attention-family continuous serving. Covers BOTH the
    # eo-stream-at-cdtype change (84212d4: eo is only consumed through
    # bahdanau_attend's values.astype(cdtype), so a cdtype-stored copy is
    # bit-identical) and the r5 pk fix (pk MUST stay f32: it feeds
    # tanh(q + pk) with no cast). The CPU suite proves TOKEN identity
    # eagerly; compiled at bf16 the pool tick and the batch beam-1 step are
    # DIFFERENT PROGRAMS, and XLA's per-program fusion of the energy path
    # (tanh(q + pk), softmax, context dot) differs at f32 ulp — one bf16
    # quantum at the logits, flipping near-tied argmaxes (first r5 on-chip
    # run: 4/5 rows exactly equal, one flipped at its position 2 and
    # free-ran — onchip_r5/tpu_checks.log forensics). Same fusion-context
    # lesson as the masked-vs-scatter int8 gap and the lineage-vs-gather
    # envelope: identity across compiled program BOUNDARIES is not a sound
    # contract at bf16. The compiled contract is therefore: every request
    # served, each row token-identical UP TO its first flip, and aggregate
    # agreement >= 0.6 with a majority of rows exactly equal (a dtype bug
    # like the bf16-pk regression this row guards flips essentially every
    # row at step 0 — the pk quantization error is ~1e-2 relative on every
    # energy term — so the thresholds separate cleanly).
    aspec = mbase.ModelSpec(
        arch="s2vt-att", vocab_size=512, embed_size=300, hidden_size=256,
        vid_feat_size=512, max_len=10, num_frames=8, dropout_p=0.0,
        sos_id=508, compute_dtype="bfloat16")
    ainit = mbase.build_model("s2vt-att")[0]
    aparams = jax.device_put(ainit(
        jax.random.PRNGKey(10), aspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    afeats = rng.standard_normal((5, 8, 512)).astype(np.float32)
    atoks, _ = decode_tokens(aparams, aspec, jnp.asarray(afeats), 509,
                             beam_size=1)
    arows = np.asarray(atoks)[:, 0]
    acc = ContinuousCaptioner(aparams, aspec, slots=2, admit_chunk=2,
                              step_chunk=2, eos_id=509)
    got_a = acc.caption_all({i: afeats[i] for i in range(5)})
    a_ok = set(got_a) == set(range(5))
    a_exact, a_agree_n, a_agree_d = 0, 0, 0
    for i2 in range(5):
        row = arows[i2]
        hits = np.nonzero(row == 509)[0]
        want_row = row[: hits[0] + 1] if len(hits) else row
        got_row = np.asarray(got_a[i2])
        n = min(len(got_row), len(want_row))
        eq = got_row[:n] == want_row[:n]
        a_agree_n += int(eq.sum())
        a_agree_d += n
        if np.array_equal(got_row, want_row):
            a_exact += 1
        else:
            print(f"  FORENSICS: key {i2}: continuous={got_row.tolist()} "
                  f"vs greedy={np.asarray(want_row).tolist()} "
                  f"(prefix agrees {int(np.argmin(eq)) if not eq.all() else n}"
                  f"/{n})")
    a_agree = a_agree_n / max(a_agree_d, 1)
    a_ok &= a_exact >= 3 and a_agree >= 0.6
    print(f"{'PASS' if a_ok else 'FAIL'}  bf16 s2vt-att continuous vs batch "
          f"greedy (compiled; eo@cdtype + pk@f32 contract: {a_exact}/5 rows "
          f"exact, agreement {a_agree:.2f}; near-tie flips allowed across "
          "program boundaries)")
    ok &= a_ok

    # (R5-2a) int8 KV-cache on the BATCH fast greedy (f32a765): lockstep
    # the int8-cache stepper against the bf16-cache stepper on the big
    # bf16 transformer (tspec/tparams/te_out from the lineage rows) —
    # identical token feed (bf16 side's argmax), compiled logit envelope
    # < 0.5 (bounded quantization error, same contract as the pool row).
    # Stepper CONSTRUCTION (incl. the quantized cache init) happens inside
    # the jit with params/e_outputs as ARGS — two hard-won on-chip lessons:
    # (1) an s4 (int4) tensor cannot cross a program boundary on this
    # backend AT ALL (eager creation, jit outputs, and jit args all die —
    # scripts/probe_int4_eager.py; the int4 pool is therefore unservable on
    # axon, see SERVING.md), so int4 must live inside ONE program; (2) a
    # CLOSED-OVER operand becomes an HLO constant and XLA constant-folds
    # its projections ON THE HOST with different rounding than the MXU
    # (measured 2e-4/element on a 4096-dot; bitwise-stable quantization) —
    # the first args-less form of this check compounded that into a bogus
    # 3.3 logit "envelope" (onchip_r5/tpu_checks.log rc=1). Args keep every
    # projection on the MXU; both steppers are built identically in-trace
    # so the envelope measures quantization alone.
    bfstep, bfinit = transformer.make_cached_stepper(tparams, tspec, te_out)
    for kvm, kv_bound in (("int8", 0.5), ("int4", 2.5)):

        @jax.jit
        def batch_lockstep(p, eo, _kv=kvm):
            _qs, _qi = transformer.make_cached_stepper(
                p, tspec, eo, kv_cache=_kv)
            _bs, _bi = transformer.make_cached_stepper(p, tspec, eo)
            sti, stf = _qi, _bi
            w = jnp.full((eo.shape[0],), tspec.sos_id, jnp.int32)

            def body(carry, i2):
                sti, stf, w = carry
                sti, li = _qs(sti, w, i2)
                stf, lf = _bs(stf, w, i2)
                gap = jnp.max(jnp.abs(li.astype(jnp.float32)
                                      - lf.astype(jnp.float32)))
                w = jnp.argmax(lf, -1).astype(jnp.int32)
                return (sti, stf, w), gap

            (_, _, _), gaps = jax.lax.scan(body, (sti, stf, w),
                                           jnp.arange(tspec.max_len))
            return jnp.max(gaps)

        bi8_gap = float(batch_lockstep(tparams, te_out))
        bi8_tok = np.asarray(jax.jit(
            lambda p, eo, _kv=kvm: transformer.decode_greedy_fast(
                p, tspec, eo, kv_cache=_kv))(tparams, te_out))
        bi8_ok = (bi8_gap < kv_bound
                  and bi8_tok.shape == (te_out.shape[0], tspec.max_len)
                  and bool((bi8_tok >= 0).all()))
        print(f"{'PASS' if bi8_ok else 'FAIL'}  {kvm} batch fast greedy "
              f"(compiled lockstep envelope {bi8_gap:.3f} < {kv_bound})")
        ok &= bi8_ok

    # (R5-2b) int8 lineage BEAM bookkeeping (f32a765): the bit-exact
    # ancestry contract re-proven with quantized caches — the same int8
    # lineage stepper under ancestry-only reorders vs physically permuted
    # codes+scales with identity ancestry must emit bit-identical tokens
    # and scores compiled (mirrors row (a); int8 codes/scales ride the
    # reorder like any other leaf).
    t8step, t8init, t8reorder = transformer.make_cached_stepper(
        tparams, tspec, te_out, beam_tile=5, lineage=True, kv_cache="int8")
    run8_anc = jax.jit(lambda st: vdecode.beam_search(
        t8step, st, te_out.shape[0], 5, tspec.max_len, tspec.sos_id, 509,
        reorder_fn=t8reorder))
    run8_phy = jax.jit(lambda st: vdecode.beam_search(
        t8step, st, te_out.shape[0], 5, tspec.max_len, tspec.sos_id, 509,
        reorder_fn=phys_reorder))
    tok8_a, sc8_a = run8_anc(t8init)
    tok8_p, sc8_p = run8_phy(t8init)
    bk8_ok = bool(np.array_equal(np.asarray(tok8_a), np.asarray(tok8_p))
                  and np.array_equal(np.asarray(sc8_a), np.asarray(sc8_p)))
    if not bk8_ok:
        dump_token_mismatch("int8-ancestry", tok8_a, "int8-physical", tok8_p,
                            sc8_a, sc8_p)
    print(f"{'PASS' if bk8_ok else 'FAIL'}  int8 lineage bookkeeping ≡ "
          "physical reorder (compiled, bit-exact)")
    ok &= bk8_ok

    # (R5-3) frozen int8 continuous artifact (fd8ba0c): export the int8
    # pool to StableHLO, replay it fresh, and demand token identity with
    # the LIVE int8 pool on the same requests (same traced program — the
    # export must not perturb the quantization arithmetic).
    from vcr_tpu import export_continuous as excont

    with tempfile.TemporaryDirectory() as td8:
        excont.export_continuous(cparams, cspec, td8, slots=3,
                                 admit_chunk=2, step_chunk=3, eos_id=509,
                                 kv_cache="int8")
        art8 = excont.load_continuous(td8)
        got_art8 = art8.caption_all({i: cfeats[i] for i in range(6)})
    f8_ok = set(got_art8) == set(range(6))
    for i2 in range(6):
        if not f8_ok:
            break
        row_ok = np.array_equal(got_art8[i2], got8[i2])
        if not row_ok:
            print(f"  FORENSICS: key {i2}: artifact="
                  f"{np.asarray(got_art8[i2]).tolist()} vs "
                  f"live={np.asarray(got8[i2]).tolist()}")
        f8_ok &= row_ok
    print(f"{'PASS' if f8_ok else 'FAIL'}  frozen int8 artifact ≡ live "
          "int8 pool (compiled replay)")
    ok &= f8_ok

    # (R5-W) int8 decode WEIGHTS (round 5, ops/wquant.py): per-output-
    # channel W8 on every decoder dense. (a) Lockstep the W8 cached stepper
    # (pre-quantized params — the pool's init-time form) against the plain
    # stepper on the big bf16 transformer; compiled logit envelope bounds
    # the rounding like the KV rows. (b) The slot pool with
    # decode_weights="int8" must emit TOKEN-IDENTICAL captions to the batch
    # W8 greedy when both consume the same pre-quantized codes (the
    # slot-vs-batch contract holds within the mode — identical elementwise
    # math, like the bf16 pool rows; only bf16-vs-int8 needs an envelope).
    tqparams = jax.device_put(transformer.quantize_decoder_params(tparams))
    wqstep, wqinit = transformer.make_cached_stepper(
        tqparams, tspec, te_out, decode_weights="int8")

    @jax.jit
    def w8_lockstep():
        sti, stf = wqinit, bfinit
        w = jnp.full((te_out.shape[0],), tspec.sos_id, jnp.int32)

        def body(carry, i2):
            sti, stf, w = carry
            sti, li = wqstep(sti, w, i2)
            stf, lf = bfstep(stf, w, i2)
            gap = jnp.max(jnp.abs(li.astype(jnp.float32)
                                  - lf.astype(jnp.float32)))
            w = jnp.argmax(lf, -1).astype(jnp.int32)
            return (sti, stf, w), gap

        (_, _, _), gaps = jax.lax.scan(body, (sti, stf, w),
                                       jnp.arange(tspec.max_len))
        return jnp.max(gaps)

    w8_gap = float(w8_lockstep())
    w8_tok = np.asarray(transformer.decode_greedy_fast(
        tqparams, tspec, te_out, decode_weights="int8"))
    w8_ok = (w8_gap < 0.5
             and w8_tok.shape == (te_out.shape[0], tspec.max_len)
             and bool((w8_tok >= 0).all()))
    print(f"{'PASS' if w8_ok else 'FAIL'}  int8 decode weights batch fast "
          f"greedy (compiled lockstep envelope {w8_gap:.3f} < 0.5)")
    ok &= w8_ok

    ccw = ContinuousCaptioner(cparams, cspec, slots=3, admit_chunk=2,
                              step_chunk=3, eos_id=509,
                              decode_weights="int8")
    got_w8 = ccw.caption_all({i: cfeats[i] for i in range(6)})
    cqparams = transformer.quantize_decoder_params(cparams)
    w8rows = np.asarray(transformer.decode_greedy_fast(
        cqparams, cspec, transformer.encode(
            cqparams, cspec, jnp.asarray(cfeats),
            transformer.create_masks_inp(cfeats), jax.random.PRNGKey(0),
            train=False), decode_weights="int8"))
    cw_ok = set(got_w8) == set(range(6))
    for i2 in range(6):
        if not cw_ok:
            break
        row = w8rows[i2]
        hits = np.nonzero(row == 509)[0]
        want_row = row[: hits[0] + 1] if len(hits) else row
        row_ok = np.array_equal(got_w8[i2], want_row)
        if not row_ok:
            print(f"  FORENSICS: key {i2}: pool="
                  f"{np.asarray(got_w8[i2]).tolist()} vs "
                  f"batch={np.asarray(want_row).tolist()}")
        cw_ok &= row_ok
    print(f"{'PASS' if cw_ok else 'FAIL'}  int8-weight pool ≡ batch W8 "
          "greedy (compiled, token-exact within mode)")
    ok &= cw_ok

    # (R5-W-gru) int8 decode weights on a GRU family (round 5,
    # decode.augment_decode_weights): the s2vt W8 pool vs the batch W8
    # beam-1 — within-mode, but still two different compiled programs at
    # bf16, so the contract is the R5-1 shape: all served, majority rows
    # exact, aggregate agreement (CPU proves eager token identity;
    # tests/test_weight_quant.py).
    gspec = mbase.ModelSpec(
        arch="s2vt", vocab_size=512, embed_size=300, hidden_size=256,
        vid_feat_size=512, max_len=10, num_frames=8, dropout_p=0.0,
        sos_id=508, compute_dtype="bfloat16")
    gparams = jax.device_put(mbase.build_model("s2vt")[0](
        jax.random.PRNGKey(13), gspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    gfeats = rng.standard_normal((5, 8, 512)).astype(np.float32)
    gtoks, _ = decode_tokens(gparams, gspec, jnp.asarray(gfeats), 509,
                             beam_size=1, decode_weights="int8")
    grows = np.asarray(gtoks)[:, 0]
    gcc = ContinuousCaptioner(gparams, gspec, slots=2, admit_chunk=2,
                              step_chunk=2, eos_id=509,
                              decode_weights="int8")
    got_g = gcc.caption_all({i: gfeats[i] for i in range(5)})
    g_ok = set(got_g) == set(range(5))
    g_exact, g_agree_n, g_agree_d = 0, 0, 0
    for i2 in range(5):
        row = grows[i2]
        hits = np.nonzero(row == 509)[0]
        want_row = row[: hits[0] + 1] if len(hits) else row
        got_row = np.asarray(got_g[i2])
        n = min(len(got_row), len(want_row))
        eq = got_row[:n] == want_row[:n]
        g_agree_n += int(eq.sum())
        g_agree_d += n
        if np.array_equal(got_row, want_row):
            g_exact += 1
        else:
            print(f"  FORENSICS: key {i2}: W8-pool={got_row.tolist()} vs "
                  f"W8-batch={np.asarray(want_row).tolist()}")
    g_agree = g_agree_n / max(g_agree_d, 1)
    g_ok &= g_exact >= 3 and g_agree >= 0.6
    print(f"{'PASS' if g_ok else 'FAIL'}  s2vt int8-weight pool vs batch W8 "
          f"beam-1 (compiled: {g_exact}/5 rows exact, agreement "
          f"{g_agree:.2f})")
    ok &= g_ok

    # (R5-4) bf16 residual-stream train program (fb3e93c): the default
    # bf16-stream transformer train step vs the VCR_TF_F32_STREAM=1
    # escape hatch, compiled — same envelope as the CPU contract (rel
    # loss gap < 5e-2, param updates within 5e-3); both programs must
    # produce finite losses on the MXU.
    from vcr_tpu.train import optim as toptim
    from vcr_tpu.train.step import build_step_fns

    wspec = mbase.ModelSpec(
        arch="transformer", vocab_size=512, embed_size=300, hidden_size=512,
        vid_feat_size=4096, max_len=10, num_frames=8, dropout_p=0.2,
        sos_id=508, compute_dtype="bfloat16", tf_layers=2, tf_heads=4)
    winit = mbase.build_model("transformer")[0]
    wparams = jax.device_put(winit(
        jax.random.PRNGKey(11), wspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    wopt = toptim.build_optimizer("adam", 1e-3, 0.0, 1.0)
    wostate = wopt.init(wparams)
    wbatch = {
        "vid_feats": jnp.asarray(
            rng.standard_normal((8, 8, 4096)), jnp.float32),
        "sent": jnp.asarray(rng.integers(0, 512, (8, 10)), jnp.int32),
        "sent_len": jnp.full((8,), 6, jnp.int32),
        "valid": jnp.ones((8,), jnp.float32),
    }
    wkey = jax.random.PRNGKey(12)
    wouts = {}
    for flag in ("0", "1"):
        os.environ["VCR_TF_F32_STREAM"] = flag
        try:
            wts, _ = build_step_fns("transformer", wspec, wopt,
                                    static_tf=1.0)
            p2, _, m2, _ = jax.jit(
                lambda p, s_, b2, k: wts(p, s_, b2, k, 1.0))(
                    wparams, wostate, wbatch, wkey)
            wouts[flag] = (jax.device_get(p2), float(m2["loss"]))
        finally:
            os.environ.pop("VCR_TF_F32_STREAM", None)
    l_bf, l_f32 = wouts["0"][1], wouts["1"][1]
    wgap = max(
        float(np.max(np.abs(np.asarray(a, np.float32)
                            - np.asarray(b2, np.float32))))
        for a, b2 in zip(jax.tree_util.tree_leaves(wouts["0"][0]),
                         jax.tree_util.tree_leaves(wouts["1"][0])))
    w_ok = (np.isfinite(l_bf) and np.isfinite(l_f32)
            and abs(l_bf - l_f32) / max(abs(l_f32), 1e-6) < 0.05
            and wgap < 5e-3)
    print(f"{'PASS' if w_ok else 'FAIL'}  bf16 residual-stream train vs "
          f"f32-stream (compiled: loss {l_bf:.4f} vs {l_f32:.4f}, "
          f"max param delta {wgap:.2e} < 5e-3)")
    ok &= w_ok

    # (R5-5) GRU gate remat (42c6d69): VCR_GRU_GATES_REMAT=1 vs 0 on the
    # bf16 s2vt train step, compiled. The recompute is the identical op
    # sequence, so the CPU contract is BITWISE; compiled they are two
    # different XLA programs (remat duplicates the gate subgraph into the
    # backward), so fusion may move an ulp — report bitwise status and
    # gate on a tight envelope, the masked-vs-scatter lesson.
    gspec = mbase.ModelSpec(
        arch="s2vt", vocab_size=512, embed_size=300, hidden_size=512,
        vid_feat_size=512, max_len=10, num_frames=8, dropout_p=0.2,
        sos_id=508, compute_dtype="bfloat16")
    ginit = mbase.build_model("s2vt")[0]
    gparams = jax.device_put(ginit(
        jax.random.PRNGKey(13), gspec,
        rng.standard_normal((512, 300)).astype(np.float32)))
    gostate = wopt.init(gparams)
    gbatch = {
        "vid_feats": jnp.asarray(
            rng.standard_normal((16, 8, 512)), jnp.float32),
        "sent": jnp.asarray(rng.integers(0, 512, (16, 10)), jnp.int32),
        "sent_len": jnp.full((16,), 6, jnp.int32),
        "valid": jnp.ones((16,), jnp.float32),
    }
    gkey = jax.random.PRNGKey(14)
    gouts = {}
    for flag in ("0", "1"):
        os.environ["VCR_GRU_GATES_REMAT"] = flag
        try:
            gts, _ = build_step_fns("s2vt", gspec, wopt, static_tf=1.0)
            p2, _, m2, _ = jax.jit(
                lambda p, s_, b2, k: gts(p, s_, b2, k, 1.0))(
                    gparams, gostate, gbatch, gkey)
            gouts[flag] = (jax.device_get(p2), float(m2["loss"]))
        finally:
            os.environ.pop("VCR_GRU_GATES_REMAT", None)
    g_bit = gouts["0"][1] == gouts["1"][1] and all(
        np.array_equal(np.asarray(a), np.asarray(b2))
        for a, b2 in zip(jax.tree_util.tree_leaves(gouts["0"][0]),
                         jax.tree_util.tree_leaves(gouts["1"][0])))
    ggap = max(
        float(np.max(np.abs(np.asarray(a, np.float32)
                            - np.asarray(b2, np.float32))))
        for a, b2 in zip(jax.tree_util.tree_leaves(gouts["0"][0]),
                         jax.tree_util.tree_leaves(gouts["1"][0])))
    g_ok = g_bit or ggap < 1e-5
    print(f"{'PASS' if g_ok else 'FAIL'}  gate remat ≡ default train step "
          f"(compiled: bitwise={g_bit}, max param delta {ggap:.2e})")
    ok &= g_ok

    print("ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
