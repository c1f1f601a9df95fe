"""Functional NN building blocks for vcr_tpu.

Everything is a pure function over parameter pytrees (nested dicts of
jnp arrays): ``*_init(key, ...) -> params`` and an apply function. No module
state — ideal for jit/pjit/scan and for sharding params with jax.sharding.
"""

from vcr_tpu.nn import attention, gumbel, init, layers, rnn  # noqa: F401
