"""Forensic probe: which EAGER s4 (jnp.int4) operations work on this
backend? The round-5 on-chip tpu_checks run found eager
``jnp.zeros(..., jnp.int4)`` dies on the axon TPU client with
"RecursionError: Recursively calling jit" (fixed via the jitted-thunk
zeros in models/transformer.py). This probe maps the rest of the eager-s4
surface so the int4 serving paths can document exactly what requires a
trace. Run on the real TPU when free:  python scripts/probe_int4_eager.py

Each case runs in its OWN SUBPROCESS: a failed s4 op can leave the axon
client wedged (subsequent legitimate ops then also fail UNIMPLEMENTED —
observed in the first in-process run, onchip_r5/probe_int4_eager.log), so
in-process try/except is not enough isolation.
"""

import subprocess
import sys

import numpy as np

_CASES = {
    "eager zeros int8": "jnp.zeros((4, 4), jnp.int8)",
    "eager zeros int4": "jnp.zeros((4, 4), jnp.int4)",
    "jitted zeros int4 (s4 OUTPUT)":
        "jax.jit(jnp.zeros, static_argnums=(0, 1))((4, 4), jnp.int4)",
    "eager astype int4":
        "jnp.round(jnp.ones((4, 4))).astype(jnp.int4)",
    "jit f32->f32 with INTERNAL s4":
        "jax.jit(lambda v: jnp.round(v).astype(jnp.int4)"
        ".astype(jnp.float32).sum())(jnp.ones((8, 64)))",
    "s4 jit-A output -> jit-B arg":
        "jax.jit(lambda c: c.astype(jnp.float32).sum())("
        "jax.jit(lambda v: jnp.round(v * 3).astype(jnp.int4))("
        "jnp.ones((512, 8, 20, 64))))",
    "int8 pool caption_all": "_pool('int8')",
    "int4 pool caption_all": "_pool('int4')",
}

_PRELUDE = """
import numpy as np
import jax, jax.numpy as jnp

def _pool(kv):
    from vcr_tpu.models import base as mbase
    from vcr_tpu.models import transformer as trm
    from vcr_tpu.serving_continuous import ContinuousCaptioner
    rng = np.random.default_rng(0)
    spec = mbase.ModelSpec(
        arch="transformer", vocab_size=128, embed_size=16, hidden_size=16,
        vid_feat_size=24, max_len=8, num_frames=4, dropout_p=0.0,
        sos_id=124, compute_dtype="bfloat16", tf_layers=2, tf_heads=2)
    params = trm.init_params(jax.random.PRNGKey(0), spec,
                             rng.standard_normal((128, 16)).astype(np.float32))
    feats = rng.standard_normal((5, 4, 24)).astype(np.float32)
    cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                             eos_id=125, kv_cache=kv)
    got = cc.caption_all({i: feats[i] for i in range(5)})
    assert sorted(got) == list(range(5))
    return jnp.zeros(())
"""


def main():
    import os

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ok = True
    for label, expr in _CASES.items():
        code = (f"import sys; sys.path.insert(0, {repo!r})\n" + _PRELUDE
                + f"\nout = ({expr})\nnp.asarray(out)\nprint('CASE_OK')\n")
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=600)
        except subprocess.TimeoutExpired:
            print(f"CRASH {label}: timeout")
            ok = False
            continue
        if r.returncode == 0 and "CASE_OK" in r.stdout:
            print(f"OK    {label}")
        else:
            tail = (r.stderr.strip().splitlines() or ["?"])[-1][:110]
            print(f"CRASH {label}: {tail}")
            if "int4" not in label and "s4" not in label:
                ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())


