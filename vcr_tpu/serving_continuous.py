"""Continuous-batching caption serving: slot-based greedy decode.

Whole-batch serving (`serving.build_captioner`, `tools.decode_corpus`) pays
for its slowest sequence: every row rides the full max_len scan even after
emitting <eos>, and a new request waits for the whole batch to drain. This
module keeps a fixed pool of R decode *slots* on device and runs the decode
cell one token at a time across ALL active slots; the host harvests finished
slots and refills them from a request queue. Utilization stays near R active
rows regardless of arrival pattern or caption-length mix — the standard
production pattern for autoregressive serving (vLLM-style), which the
reference (greedy batch rollouts only, S2VTModel.py:148-177) has no answer
to.

TPU-first mechanics:
  - every device function is jitted once with FIXED shapes: admission encodes
    a constant-size chunk (A videos, short rows masked by `valid`), admission
    scatters rows into slots with a drop-sentinel `.at[ids].set(mode="drop")`,
    and each tick advances all R slots `step_chunk` micro-steps in one
    lax.scan — no recompiles, no data-dependent shapes;
  - slot decode state is exactly the family's stepper state (decode.py):
    {"s1","s2"} for the s2vt cell, {"h","pk","eo"} for the s2vt-att cell, so
    the cell math is the proven stepper code, not a re-implementation;
  - finished slots stop changing state (masked by `active`) — their rows
    still flow through the matmuls (fixed shapes beat ragged dispatch on the
    MXU) but are dead weight only until the next harvest tick;
  - host<->device traffic per tick is one (R,) bool + one small readback of
    finished rows. Through the axon tunnel each readback costs ~24ms (CLAUDE
    notes); on a real host it is microseconds.

Families: ALL FIVE — s2vt, s2vt-att, spatial (s2vt/att base), rationale
(s2vt/att base) through their GRU decode cells, and the transformer through
``transformer.make_slot_stepper``: a per-slot-position variant of the
KV-cached serving stepper (each row carries its own position; cache writes
scatter at (row, i_vec[row]), the causal mask and PE gather per row; cross
K/V live in slot state since they depend on the slot's video).

Finished slots are NOT masked out of the step math: a dead row free-runs on
garbage (bounded by the GRU's tanh/sigmoid or the transformer's layernorms,
read by nobody, fully reset at the next admission) — masking the state would
cost a full where-copy of every KV cache leaf per step, the exact HBM
traffic the lineage beam removed. Only the tiny bookkeeping leaves (last /
steps / active / toks) are masked.

Greedy parity: a slot's harvested tokens equal the family's batch greedy
rollout truncated at the first <eos> (same cell, same argmax; the batch
rollout free-runs past <eos>, a slot stops) — locked by
tests/test_serving_continuous.py against decode_tokens/sample_tokens(top_k=1).
"""

from __future__ import annotations

import os
from collections import deque
from typing import Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.decode import (NEG_INF, _s2vt_att_stepper, _s2vt_stepper,
                            augment_decode_weights)
from vcr_tpu.models import base as model_base
from vcr_tpu.models import s2vt, s2vt_att
from vcr_tpu.models import transformer as tr
from vcr_tpu.nn.attention import bahdanau_project_keys
from vcr_tpu.serving import resolve_eos_id

_ARCHS = ("s2vt", "s2vt-att", "spatial", "rationale", "transformer")


def _row_sampling_filters(logits: jax.Array, temp: jax.Array, topk: jax.Array,
                          topp: jax.Array) -> jax.Array:
    """Row-wise decode.apply_sampling_filters: (R, V) logits filtered by
    per-row temperature / top_k / top_p arrays (0 disables a filter for that
    row, like the scalar version). Equal to the scalar filters on uniform
    rows (differential-tested)."""
    v = logits.shape[-1]
    lg = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6)[:, None]
    sorted_lg = -jnp.sort(-lg, axis=-1)                       # descending
    k_idx = jnp.clip(topk - 1, 0, v - 1)[:, None]
    kth = jnp.take_along_axis(sorted_lg, k_idx, axis=-1)
    lg = jnp.where((topk[:, None] > 0) & (lg < kth), NEG_INF, lg)
    probs = jax.nn.softmax(lg, axis=-1)
    sp = jnp.sort(probs, axis=-1)[:, ::-1]
    before = jnp.cumsum(sp, axis=-1) - sp                     # mass above
    keep = jnp.sum(before < topp[:, None], axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(sp, jnp.clip(keep - 1, 0, v - 1), axis=-1)
    apply_p = (topp > 0.0) & (topp < 1.0)
    return jnp.where(apply_p[:, None] & (probs < thresh), NEG_INF, lg)


def run_slot_scheduler(ops, requests: Iterable[Optional[Tuple[object,
                                                               np.ndarray]]],
                       *, poll_cancelled=None
                       ) -> Iterator[Tuple[object, np.ndarray]]:
    """The host-side slot scheduler, shared by the live ContinuousCaptioner
    and the exported-artifact server (export_continuous.py). ``ops`` supplies
    the device half:

      slots / admit_chunk / step_chunk : pool geometry (ints)
      stats : dict, in_flight : int    : observability (mutated here)
      encode_admit(feats (A,...), ids (A,), valid (A,)) : encode a chunk and
          scatter it into the slots
      tick() : advance all slots step_chunk greedy tokens
      poll_active() -> np.bool_ (R,)   : which slots still decode
      read_tokens() -> (toks (R, L), steps (R,)) numpy

    ``requests``: iterable of (key, feats) — or (key, feats, opts) where
    ``opts`` is a per-request dict (e.g. sampling parameters); forwarding
    opts requires ``ops.accepts_request_opts`` (a ValueError otherwise —
    loud beats a silently-ignored request parameter). Pulled lazily, so a
    generator models live arrivals. A live source (e.g. a server draining a
    socket) may yield ``None`` as a poll marker — "nothing available right
    now" — which skips admission for that round instead of blocking
    in-flight decodes; raise StopIteration (return) to drain and finish.
    Yields (key, tokens (n,) int32 ending at <eos> or max_len) in COMPLETION
    order.

    ``poll_cancelled`` (optional): callable taking the set of outstanding
    request keys (queued + in-flight) and returning the subset to CANCEL —
    e.g. requests whose client timed out or disconnected. Queued cancels are
    simply dropped; in-flight cancels release their slots immediately via
    ``ops.release_slots(ids)`` (required for in-flight cancellation — pools
    without it only drop queued cancels) so capacity returns to the pool
    instead of decoding to max_len for nobody. Cancelled keys are never
    yielded; ``ops.stats["cancelled"]`` counts them.
    """
    a = ops.admit_chunk
    accepts_opts = getattr(ops, "accepts_request_opts", False)
    can_release = hasattr(ops, "release_slots")
    queue: deque = deque()
    req_iter = iter(requests)
    pending: Dict[int, object] = {}       # slot -> request key
    free = list(range(ops.slots - 1, -1, -1))
    exhausted = False
    feat_shape = None  # inferred from the first request (spatial feats
    #                    are (N, F, K, K); the GRU families (N, Dv))

    while True:
        # refill the host-side queue enough to fill free slots
        while not exhausted and len(queue) < min(len(free), a):
            try:
                item = next(req_iter)
            except StopIteration:
                exhausted = True
                break
            if item is None:      # poll marker: keep ticking
                break
            queue.append(item)
        # sweep cancellations AFTER the refill, BEFORE admission: a freshly
        # pulled request is checked before it ever touches the device, and a
        # released slot is admittable this same round
        if poll_cancelled is not None and (pending or queue):
            outstanding = {it[0] for it in queue}
            if can_release:
                outstanding |= set(pending.values())
            gone = poll_cancelled(outstanding)
            if gone:
                n_q = len(queue)
                queue = deque(it for it in queue if it[0] not in gone)
                n_cancel = n_q - len(queue)
                slot_ids = [s for s, key in pending.items() if key in gone]
                if slot_ids:
                    ops.release_slots(np.asarray(slot_ids, np.int32))
                    for s in slot_ids:
                        pending.pop(s)
                        free.append(s)
                    n_cancel += len(slot_ids)
                    ops.in_flight = len(pending)
                ops.stats["cancelled"] = (ops.stats.get("cancelled", 0)
                                          + n_cancel)
        # admit up to A requests into free slots (fixed-shape chunk)
        if queue and free:
            n = min(len(queue), len(free), a)
            if feat_shape is None:
                feat_shape = tuple(np.asarray(queue[0][1]).shape)
            feats = np.zeros((a,) + feat_shape, np.float32)
            ids = np.zeros((a,), np.int32)
            valid = np.zeros((a,), bool)
            keys = []
            chunk_opts = [None] * a
            for j in range(n):
                item = queue.popleft()
                key, f = item[0], item[1]
                opt = item[2] if len(item) > 2 else None
                if opt and not accepts_opts:
                    raise ValueError(
                        f"request {key!r} carries opts {sorted(opt)} but "
                        "this pool does not accept per-request options "
                        "(greedy/beam mode, or a frozen artifact)")
                feats[j] = np.asarray(f, np.float32).reshape(feat_shape)
                ids[j] = free.pop()
                valid[j] = True
                keys.append(key)
                chunk_opts[j] = opt
            ops.stats["admit_chunks"] += 1
            if accepts_opts:
                ops.encode_admit(feats, ids, valid, chunk_opts)
            else:
                ops.encode_admit(feats, ids, valid)
            for j in range(n):
                pending[int(ids[j])] = keys[j]
            ops.in_flight = len(pending)

        if not pending:
            if exhausted and not queue:
                return
            continue

        # advance all slots, then harvest finished ones
        ops.tick()
        ops.stats["ticks"] += 1
        ops.stats["slot_steps"] += ops.slots * ops.step_chunk
        active = ops.poll_active()
        done = [s for s in pending if not active[s]]
        if done:
            toks, steps = ops.read_tokens()
            for s in done:
                ops.stats["served"] += 1
                ops.stats["useful_steps"] += int(steps[s])
                result = pending.pop(s), toks[s, : steps[s]].copy()
                ops.in_flight = len(pending)
                free.append(s)
                yield result


class ContinuousCaptioner:
    """Slot-pool greedy captioner. See module docstring.

    Args:
      params / spec: a trained model (any of the five families).
      slots: R, the device slot-pool size (the effective serving batch).
      admit_chunk: A, videos encoded per admission call (fixed shape; the
        queue is drained A at a time into free slots).
      step_chunk: decode micro-steps per tick between host polls. Larger
        amortizes host round-trips; smaller harvests/refills sooner. max_len
        is a natural upper bound.
      eos_id / vocab: end-token resolution (serving.resolve_eos_id).
      rng: base key for RationaleNet's eval-time hard-Gumbel frame selection
        (fold_in per admission chunk); unused by the other families.
      beam_size: K > 1 switches the pool to continuous BEAM search: each slot
        owns K adjacent device rows running decode.beam_search's exact step
        (two-stage top-k, eos-clamped continuation, within-slot reorder);
        harvested tokens are the BEST beam cut at its first <eos> — equal to
        the batch beam's best row. ALL FIVE families: the GRU cells reorder
        their small recurrent state; the transformer uses the lineage slot
        stepper (make_slot_stepper(lineage=True) — per-row positions AND
        gather-free beam: only the ancestry matrix is permuted, never the
        KV caches).
      sample_temperature / sample_top_k / sample_top_p: temperature > 0
        switches the (beam_size=1) pool to per-slot stochastic decoding:
        logits pass the row-wise equivalent of decode.apply_sampling_filters
        and each slot draws from its own PRNG stream — a per-request key
        scattered at admission (fold_in of the admission counter, split per
        chunk row), folded with the slot's step index per token.
        Deterministic per (rng, admission order): re-serving the same stream
        reproduces the same captions; top_k=1 collapses to argmax and equals
        greedy mode exactly. Live pool only (the frozen export_continuous
        artifact stays greedy/beam).
      request_sampling: accept PER-REQUEST sampling parameters (vLLM-style):
        scheduler requests may carry an opts dict ({"temperature", "top_k",
        "top_p"}, any subset) that overrides the pool defaults for that
        slot only — temperature/top_k/top_p live in per-slot state arrays
        and every filter is row-wise, so a greedy request (the default when
        the pool-level temperature is 0: T=1, top_k=1 == argmax) and a hot
        nucleus request decode side by side in one pool. Implied by
        sample_temperature > 0.
      mesh: optional jax.sharding.Mesh (parallel.mesh.make_mesh) — the slot
        axis is sharded over its "dp" axis (slots % dp == 0) and params are
        sharded like training (parallel.mesh.shard_params): vocab projection
        and embedding table over the "mp" axis, the rest replicated. Every
        tick's matmuls then run dp-wide AND the per-token vocab projection
        tensor-parallel under GSPMD. Admission chunks stay host-global: the
        scatter into the sharded slot axis is partitioned by XLA (an A-row
        chunk is tiny next to the caches). Token-exact vs the unsharded pool
        (tested on dp=4 and dp=2 x mp=4 CPU meshes). For these model sizes
        mp serving is a capability (HBM headroom for huge vocabularies),
        not a latency win — the per-step collectives cost more than the
        split projection saves below ~100k vocab.
    """

    def __init__(self, params, spec: model_base.ModelSpec, *,
                 slots: int = 64, admit_chunk: int = 8, step_chunk: int = 4,
                 eos_id: Optional[int] = None, vocab=None, rng=None,
                 mesh=None, beam_size: int = 1,
                 sample_temperature: float = 0.0, sample_top_k: int = 0,
                 sample_top_p: float = 0.0, request_sampling: bool = False,
                 kv_cache: Optional[str] = None,
                 decode_weights: Optional[str] = None):
        if spec.arch not in _ARCHS:
            raise NotImplementedError(
                f"continuous serving covers {_ARCHS}; got {spec.arch!r}")
        if not 1 <= admit_chunk <= slots:
            raise ValueError("need 1 <= admit_chunk <= slots")
        if (sample_temperature > 0 or request_sampling) and beam_size > 1:
            raise ValueError("per-slot sampling and beam search are "
                             "mutually exclusive (beam maximizes sequence "
                             "log-prob; sampling draws from it)")
        self.spec = spec
        self.params = params
        self.slots = slots
        self.admit_chunk = admit_chunk
        self.step_chunk = min(step_chunk, spec.max_len)
        self.beam_size = beam_size
        self.eos_id = resolve_eos_id(spec, eos_id, vocab)
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.sample_temperature = sample_temperature
        self.sample_top_k = sample_top_k
        self.sample_top_p = sample_top_p
        self._sample = sample_temperature > 0 or request_sampling
        # scheduler protocol capability flag (run_slot_scheduler checks it
        # before forwarding per-request opts)
        self.accepts_request_opts = self._sample
        # per-row defaults for requests that carry no opts: the pool-level
        # sampling knobs when set, else exact greedy (T=1, top_k=1 == argmax)
        self._row_defaults = ((sample_temperature, sample_top_k, sample_top_p)
                              if sample_temperature > 0 else (1.0, 1, 0.0))
        # per-slot sampling keys ride the state pytree as RAW uint32 key data
        # (scatter-friendly); derive the base from `rng` in raw form
        base = self._rng
        if jnp.issubdtype(jnp.asarray(base).dtype, jax.dtypes.prng_key):
            base = jax.random.key_data(base)
        self._sample_base = jnp.asarray(base, jnp.uint32)
        self._admit_count = 0
        self.stats = {"ticks": 0, "admit_chunks": 0, "served": 0,
                      "useful_steps": 0, "slot_steps": 0, "cancelled": 0}
        # live count of occupied slots, maintained by caption_stream — a
        # polling request source reads it to choose between a blocking wait
        # (pool idle: no harm) and a non-blocking poll (decodes in flight:
        # never stall the tick loop on an empty queue)
        self.in_flight = 0

        # stepper params + cell family: spatial/rationale decode through
        # their wrapped captioner (decode.py:275-309)
        if spec.arch in ("spatial", "rationale"):
            self._dec_params = params["caption_net"]
            self._base = spec.base_arch
        else:
            self._dec_params = params
            self._base = spec.arch

        # int8 KV-cache serving (transformer only — the GRU families carry no
        # attention cache): halves the tick's dominant HBM byte stream at a
        # bounded quantization error. See transformer.make_slot_stepper and
        # ops/kvquant.py; NOT token-identical to the bf16 pool.
        self.kv_cache = kv_cache or os.environ.get("VCR_KV_CACHE", "bf16")
        if self.kv_cache not in ("bf16", "int8", "int4"):
            raise ValueError(f"kv_cache must be 'bf16', 'int8' or 'int4', "
                             f"got {self.kv_cache!r}")
        if self.kv_cache != "bf16" and self._base != "transformer":
            raise ValueError(
                f"kv_cache={self.kv_cache!r} quantizes the transformer's "
                f"attention caches; arch {spec.arch!r} "
                f"(base {self._base!r}) has none")

        # int8 decode WEIGHTS (all families): per-output-channel W8 for
        # every per-tick dense weight — the transformer's decoder stack
        # (the largest remaining byte term once its KV caches are
        # int8/int4) and the GRU families' rnn gates + vocab projection
        # (which DOMINATE a GRU tick's bytes — the recurrent state is just
        # h). See ops/wquant.py, transformer.quantize_decoder_params and
        # decode.augment_decode_weights; bounded-error, composes with
        # kv_cache. Pre-quantization happens ONCE here so the tick jit
        # receives int8 weight ARGS — in-trace quantization would re-read
        # the f32 weights inside every compiled tick.
        self.decode_weights = (decode_weights
                               or os.environ.get("VCR_DECODE_WEIGHTS", "bf16"))
        if self.decode_weights not in ("bf16", "int8"):
            raise ValueError(f"decode_weights must be 'bf16' or 'int8', "
                             f"got {self.decode_weights!r}")
        if self.decode_weights == "int8":
            if mesh is not None and dict(mesh.shape).get("mp", 1) > 1:
                raise ValueError(
                    "decode_weights='int8' with an mp>1 mesh is unsupported"
                    ": the int8 vocab projection does not column-shard")
            if self._base == "transformer":
                # decoder denses REPLACED (encoder untouched) — one tree
                # serves encode + tick; steppers detect "wq" and skip.
                params = tr.quantize_decoder_params(params)
                self.params = params
                self._dec_params = params
            # GRU families AUGMENT instead (the same rnn dicts drive the
            # encoder scans): _step_params is built after the mesh block.

        # the pool state (incl. the transformer's KV caches — by far the
        # largest leaves) is DONATED to every state->state device fn: without
        # donation XLA cannot alias the scatter updates and each tick pays a
        # full state copy of HBM traffic; self.state is reassigned from the
        # result every call, so the consumed buffer is never reused (CPU
        # ignores donation — the warning is benign there)
        self._jit_encode = jax.jit(self._encode_chunk)
        self._jit_admit = jax.jit(self._admit, donate_argnums=(0,))
        self._jit_release = jax.jit(
            lambda state, ids: dict(state, active=state["active"].at[ids].set(
                False, mode="drop")), donate_argnums=(0,))
        self._jit_step = jax.jit(self._step_n if beam_size == 1
                                 else self._step_n_beam,
                                 donate_argnums=(1,))
        self.state = self._init_state()

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from vcr_tpu.parallel.mesh import shard_params

            dp = mesh.shape["dp"]
            if slots % dp:
                raise ValueError(f"slots={slots} not divisible by dp={dp}")
            mp = mesh.shape.get("mp", 1)
            if mp > 1 and spec.padded_vocab_size % mp:
                # an mp mesh is requested for HBM headroom (huge vocab); a
                # silent fall-back to replication would defeat exactly that,
                # so fail loudly like the slots/dp check above (mesh.py only
                # warns, because training can still want mp for other leaves)
                raise ValueError(
                    f"padded vocab {spec.padded_vocab_size} not divisible by "
                    f"mesh mp={mp}: the vocab projection/embedding cannot "
                    "shard and the pool would silently replicate. Set "
                    "vocab_pad_to to a multiple of mp (or pass an mp=1 "
                    "mesh).")

            def _rows(leaf):
                spec_axes = ("dp",) + (None,) * (leaf.ndim - 1)
                return jax.device_put(leaf, NamedSharding(mesh, P(*spec_axes)))

            # params shard exactly like training (parallel/mesh.py): the
            # vocab projection column-wise and the embedding table row-wise
            # over the mesh's mp axis, everything else replicated (mp=1 ->
            # full replication). The tick's logits come out vocab-sharded and
            # the argmax/top-k/softmax reductions pull the psum over mp —
            # tensor-parallel serving with the same step code, token-exact
            # vs the unsharded pool (tested on a dp=2 x mp=4 CPU mesh).
            self.params = shard_params(params, mesh, spec.padded_vocab_size)
            self._dec_params = (self.params["caption_net"]
                                if spec.arch in ("spatial", "rationale")
                                else self.params)
            self.state = jax.tree_util.tree_map(_rows, self.state)

        # The tree the TICK jit receives. For the GRU families under
        # decode_weights="int8" it carries the augmented W8 decode dicts
        # (decode.augment_decode_weights) next to the f32 originals —
        # _encode_chunk keeps using self.params, the tick streams the
        # codes. Transformer/bf16: same object as self.params.
        self._step_params = self.params
        if self.decode_weights == "int8" and self._base != "transformer":
            self._step_params = augment_decode_weights(self.params, spec)

    # ---------------------------------------------------------- device fns

    def _zeros_dec_state(self, rows: int):
        spec = self.spec
        if self._base == "transformer":
            _, init_self, _ = tr.make_slot_stepper(
                self._dec_params, spec, beam_tile=self.beam_size,
                lineage=self.beam_size > 1, kv_cache=self.kv_cache,
                decode_weights=self.decode_weights)
            # widths are spec-derived (transformer._width quirk): read the
            # attention width off the params, like the stepper does
            hidden = tr._attn_hidden(self._dec_params["decoder"]["layers"])
            d_k = hidden // spec.tf_heads
            if self.kv_cache in ("int8", "int4"):
                from vcr_tpu.ops import kvquant

                _, qdtype = kvquant.mode_params(self.kv_cache)
                zxq = tr._jit_zeros(
                    (rows, spec.tf_heads, spec.num_frames, d_k), qdtype)
                zxs = jnp.zeros((rows, spec.tf_heads, spec.num_frames),
                                jnp.float32)
                cross_zero = (zxq, zxs, zxq, zxs)
            else:
                zx = jnp.zeros((rows, spec.tf_heads, spec.num_frames, d_k),
                               spec.cdtype)
                cross_zero = (zx, zx)
            return {**init_self(rows),
                    **{f"x{li}": cross_zero for li in range(spec.tf_layers)}}
        h = jnp.zeros((rows, spec.hidden_size), jnp.float32)
        if self._base == "s2vt":
            return {"s1": h, "s2": h}
        n = spec.num_frames
        # pk/eo are the tick's dominant HBM stream (read whole every step).
        # eo is stored at cdtype: it is only ever consumed through
        # bahdanau_attend's values.astype(cdtype) cast, so consuming a
        # cdtype-stored copy is bit-identical to the batch steppers and
        # halves the per-tick context read at bf16. pk must stay f32:
        # bahdanau_project_keys returns f32 (vdot accumulates at f32 and the
        # bias add is f32) and bahdanau_attend adds it to the f32 query
        # projection inside tanh with NO cdtype cast — storing it at bf16
        # would round the energies and break token-exact parity with the
        # batch greedy/beam steppers. h stays f32 (recurrent state, parity
        # with the batch steppers' f32 carry).
        eo = jnp.zeros((rows, n, spec.hidden_size), spec.cdtype)
        pk = jnp.zeros((rows, n, spec.hidden_size), jnp.float32)
        return {"h": h, "pk": pk, "eo": eo}

    def _init_state(self):
        st = self._init_state_shared()
        # the zeros above reuse one array for several leaves (s1/s2, pk/eo,
        # every layer's K and V) — fine functionally, but state leaves are
        # DONATED to the tick/admit jits, and donating one buffer twice is a
        # runtime error; give every leaf its own buffer
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)

    def _init_state_shared(self):
        r, l = self.slots, self.spec.max_len
        common = {
            "steps": jnp.zeros((r,), jnp.int32),
            "active": jnp.zeros((r,), jnp.bool_),
            "toks": jnp.zeros((r, l), jnp.int32),
        }
        if self.beam_size == 1:
            st = {
                "dec": self._zeros_dec_state(r),
                "last": jnp.full((r,), self.spec.sos_id, jnp.int32),
                **common,
            }
            if self._sample:
                st["skey"] = jnp.zeros((r, *self._sample_base.shape),
                                       jnp.uint32)
                t0, k0, p0 = self._row_defaults
                st["stemp"] = jnp.full((r,), t0, jnp.float32)
                st["stopk"] = jnp.full((r,), k0, jnp.int32)
                st["stopp"] = jnp.full((r,), p0, jnp.float32)
            return st
        rows = r * self.beam_size
        # beam mode: each slot owns K adjacent rows (beam-major-inner, like
        # decode._tile_beam); "steps" stays the HARVEST length the scheduler
        # reads (first-eos cut of the best beam), "gstep" counts decode steps
        return {
            "dec": self._zeros_dec_state(rows),
            "last": jnp.full((rows,), self.spec.sos_id, jnp.int32),
            "scores": jnp.zeros((rows,), jnp.float32),
            "bfin": jnp.zeros((rows,), jnp.bool_),
            "btoks": jnp.zeros((rows, l), jnp.int32),
            "gstep": jnp.zeros((r,), jnp.int32),
            **common,
        }

    def _encode_chunk(self, params, feats, rng):
        """(A, F, Dv) float32 -> per-row decode-state pytree (A rows).
        Admission cost: one fixed-shape encoder forward per chunk."""
        spec = self.spec
        if spec.arch == "rationale":
            from vcr_tpu.models import rationale

            sel, _ = rationale.generator(params["gen"], spec,
                                         feats.astype(spec.cdtype), rng,
                                         train=False)
            feats, params = sel, params["caption_net"]
            arch = spec.base_arch
        elif spec.arch == "spatial":
            from vcr_tpu.models import spatial

            out1, rnn_state, _alphas, _bn = spatial.encode_spatial(
                params, spec, feats, train=False)
            cap = params["caption_net"]
            if spec.base_arch == "s2vt":
                return {"s1": rnn_state,
                        "s2": s2vt._prime_state2(cap, spec, out1)}
            eo = jnp.transpose(out1, (1, 0, 2))
            return {"h": rnn_state, "eo": eo.astype(spec.cdtype),
                    "pk": bahdanau_project_keys(cap["decoder"]["attention"],
                                                eo, spec.cdtype)}
        elif spec.arch == "transformer":
            src_mask = tr.create_masks_inp(feats)
            e_out = tr.encode(params, spec, feats, src_mask, rng, train=False)
            _, init_self, cross_state = tr.make_slot_stepper(
                params, spec, beam_tile=self.beam_size,
                lineage=self.beam_size > 1, kv_cache=self.kv_cache,
                decode_weights=self.decode_weights)
            # full dec-state rows (self caches zeroed): admission's generic
            # scatter then also RESETS the slot's self caches (beam mode: the
            # tiled ancestry is garbage here; _admit re-arms it per group)
            return {**init_self(feats.shape[0]), **cross_state(e_out)}
        else:
            arch = spec.arch
        if arch == "s2vt":
            enc_outs, s1 = s2vt.encode(params, spec, feats)
            return {"s1": s1, "s2": s2vt._prime_state2(params, spec, enc_outs)}
        eo, h = s2vt_att.encode(params, spec, feats)
        return {"h": h, "eo": eo.astype(spec.cdtype),
                "pk": bahdanau_project_keys(params["decoder"]["attention"],
                                            eo, spec.cdtype)}

    def _admit(self, state, new_dec, slot_ids, valid, row_keys=None,
               row_opts=None):
        """Scatter `new_dec` rows into `slot_ids` (invalid rows -> the R
        drop-sentinel) and reset the slots' decode bookkeeping. Sampling
        mode also installs each request's PRNG key (`row_keys`, raw data)
        and its sampling parameters (`row_opts` = (temp, top_k, top_p)
        arrays, pool defaults where the request carried none)."""
        ids = jnp.where(valid, slot_ids, self.slots).astype(jnp.int32)
        if self.beam_size == 1:
            dec = jax.tree_util.tree_map(
                lambda leaf, new: leaf.at[ids].set(
                    new.astype(leaf.dtype), mode="drop"),
                state["dec"], new_dec)
            st = {
                "dec": dec,
                "last": state["last"].at[ids].set(self.spec.sos_id,
                                                  mode="drop"),
                "steps": state["steps"].at[ids].set(0, mode="drop"),
                "active": state["active"].at[ids].set(True, mode="drop"),
                "toks": state["toks"].at[ids].set(0, mode="drop"),
            }
            if self._sample:
                temp, topk, topp = row_opts
                st["skey"] = state["skey"].at[ids].set(row_keys, mode="drop")
                st["stemp"] = state["stemp"].at[ids].set(temp, mode="drop")
                st["stopk"] = state["stopk"].at[ids].set(topk, mode="drop")
                st["stopp"] = state["stopp"].at[ids].set(topp, mode="drop")
            return st
        k = self.beam_size
        a = ids.shape[0]
        row_ids = (ids[:, None] * k + jnp.arange(k)[None, :]).reshape(-1)
        tiled = jax.tree_util.tree_map(lambda x: jnp.repeat(x, k, axis=0),
                                       new_dec)
        dec = jax.tree_util.tree_map(
            lambda leaf, new: leaf.at[row_ids].set(
                new.astype(leaf.dtype), mode="drop"),
            state["dec"], tiled)
        if "anc" in dec:
            # lineage transformer: re-arm each fresh group's ancestry to the
            # local identity (row j of the group owns its column-j history) —
            # the tiled encode copy above duplicated beam 0's
            l = state["btoks"].shape[1]
            anc0 = jnp.tile((row_ids % k).astype(jnp.int32)[:, None], (1, l))
            dec = dict(dec, anc=dec["anc"].at[row_ids].set(anc0, mode="drop"))
        # only beam 0 live at step 0 (all K are identical copies)
        scores0 = jnp.tile(jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]), (a,)
        ).astype(jnp.float32)
        return {
            "dec": dec,
            "last": state["last"].at[row_ids].set(self.spec.sos_id,
                                                  mode="drop"),
            "scores": state["scores"].at[row_ids].set(scores0, mode="drop"),
            "bfin": state["bfin"].at[row_ids].set(False, mode="drop"),
            "btoks": state["btoks"].at[row_ids].set(0, mode="drop"),
            "gstep": state["gstep"].at[ids].set(0, mode="drop"),
            "steps": state["steps"].at[ids].set(0, mode="drop"),
            "active": state["active"].at[ids].set(True, mode="drop"),
            "toks": state["toks"].at[ids].set(0, mode="drop"),
        }

    def _step_n(self, params, state):
        """Advance every active slot `step_chunk` greedy tokens (one scan)."""
        spec = self.spec
        r = self.slots
        rows = jnp.arange(r)

        dparams = (params["caption_net"]
                   if spec.arch in ("spatial", "rationale") else params)

        def micro(st, _):
            dec, active = st["dec"], st["active"]
            # dead rows free-run unmasked (see module docstring); only the
            # bookkeeping leaves below are masked by `active`
            if self._base == "transformer":
                step_fn, _, _ = tr.make_slot_stepper(
                    dparams, spec, kv_cache=self.kv_cache,
                    decode_weights=self.decode_weights)
                i_vec = jnp.minimum(st["steps"], spec.max_len - 1)
                new_dec, logits = step_fn(dec, st["last"], i_vec)
                dec = new_dec
            else:
                if self._base == "s2vt":
                    step_fn = _s2vt_stepper(
                        dparams, spec, r,
                        decode_weights=self.decode_weights)
                    inner = {"s1": dec["s1"], "s2": dec["s2"]}
                else:
                    step_fn = _s2vt_att_stepper(
                        dparams, spec, dec["pk"], dec["eo"],
                        decode_weights=self.decode_weights)
                    inner = {"h": dec["h"]}
                new_inner, logits = step_fn(inner, st["last"], jnp.int32(0))
                dec = dict(dec, **new_inner)
            if self._sample:
                # row-wise apply_sampling_filters: each slot filters by ITS
                # request's (temperature, top_k, top_p); rows with
                # (1, 1, 0) — the no-opts default of a greedy pool — reduce
                # exactly to argmax (locked by the row/scalar differential
                # and greedy-anchor tests)
                filt = _row_sampling_filters(logits, st["stemp"],
                                             st["stopk"], st["stopp"])
                # per-slot stream: request key (installed at admission)
                # folded with the slot's step index — independent of pool
                # geometry and of whatever other slots are doing
                nxt = jax.vmap(
                    lambda kd, s, lg: jax.random.categorical(
                        jax.random.fold_in(kd, s), lg)
                )(st["skey"], st["steps"], filt).astype(jnp.int32)
            else:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            pos = jnp.minimum(st["steps"], spec.max_len - 1)
            old = st["toks"][rows, pos]
            toks = st["toks"].at[rows, pos].set(jnp.where(active, nxt, old))
            steps = st["steps"] + active.astype(jnp.int32)
            still = active & (nxt != self.eos_id) & (steps < spec.max_len)
            last = jnp.where(active, nxt, st["last"])
            return dict(st, dec=dec, last=last, steps=steps, active=still,
                        toks=toks), None

        state, _ = jax.lax.scan(micro, state, None, length=self.step_chunk)
        return state

    def _step_n_beam(self, params, state):
        """Beam-mode tick: each slot's K rows run one beam-search step
        (decode.beam_search's exact body — two-stage top-k, eos-clamped
        continuation, within-group reorder), then the slot-level harvest view
        (toks/steps = best beam cut at its first <eos>) is refreshed for
        active slots. A slot finishes when all K beams emitted <eos> (the
        batch search instead free-extends with zero-cost <eos> to max_len —
        same beams, same scores; we just stop paying for the tail)."""
        spec = self.spec
        g, k = self.slots, self.beam_size
        rows = g * k
        l = spec.max_len
        rows_idx = jnp.arange(rows)

        dparams = (params["caption_net"]
                   if spec.arch in ("spatial", "rationale") else params)

        def micro(st, _):
            dec, active = st["dec"], st["active"]
            if self._base == "transformer":
                step_fn, _, _ = tr.make_slot_stepper(
                    dparams, spec, beam_tile=k, lineage=True,
                    kv_cache=self.kv_cache, decode_weights=self.decode_weights)
                i_vec = jnp.repeat(jnp.minimum(st["gstep"], l - 1), k)
                dec, logits = step_fn(dec, st["last"], i_vec)
            elif self._base == "s2vt":
                step_fn = _s2vt_stepper(dparams, spec, rows,
                                        decode_weights=self.decode_weights)
                inner = {"s1": dec["s1"], "s2": dec["s2"]}
                new_inner, logits = step_fn(inner, st["last"], jnp.int32(0))
                dec = dict(dec, **new_inner)
            else:
                step_fn = _s2vt_att_stepper(dparams, spec, dec["pk"],
                                            dec["eo"],
                                            decode_weights=self.decode_weights)
                inner = {"h": dec["h"]}
                new_inner, logits = step_fn(inner, st["last"], jnp.int32(0))
                dec = dict(dec, **new_inner)

            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            v = logp.shape[-1]
            cont = jnp.where(st["bfin"][:, None],
                             jnp.full((1, v), NEG_INF).at[0, self.eos_id]
                             .set(0.0), logp)
            s1, i1 = jax.lax.top_k(st["scores"][:, None] + cont, k)
            total = s1.reshape(g, k * k)
            top_scores, top_idx = jax.lax.top_k(total, k)       # (G, K)
            beam_idx = top_idx // k
            word_idx = jnp.take_along_axis(
                i1.reshape(g, k * k), top_idx, axis=1).astype(jnp.int32)

            flat_src = (jnp.arange(g)[:, None] * k + beam_idx).reshape(-1)
            if self._base == "transformer":
                # lineage: beam reorder permutes ONLY the ancestry matrix;
                # the KV caches are never physically moved
                dec = dict(dec, anc=dec["anc"][flat_src])
            elif self._base == "s2vt":
                dec = jax.tree_util.tree_map(lambda x: x[flat_src], dec)
            else:
                # s2vt-att: pk/eo are per-VIDEO encoder constants, identical
                # across a group's K rows — flat_src permutes only within
                # groups, so gathering them is a no-op worth (R*K, N, H)x2 of
                # pure HBM traffic per step (measured 93 KB/token at the
                # analyze_slot_tick.py toy widths, ~7x the whole rest of the
                # step's moved bytes; the batch beam already passes them
                # closed-over, decode.py:270). Only `h` truly reorders.
                dec = dict(dec, h=dec["h"][flat_src])
            btoks = st["btoks"][flat_src]
            bfin = st["bfin"][flat_src]
            words = word_idx.reshape(-1)
            pos_rows = jnp.repeat(jnp.minimum(st["gstep"], l - 1), k)
            btoks = btoks.at[rows_idx, pos_rows].set(words)
            bfin = bfin | (words == self.eos_id)
            scores = top_scores.reshape(-1)

            # dead slots: freeze every bookkeeping leaf (their dec rows
            # free-run like greedy mode — unread, reset at admission)
            act_r = jnp.repeat(active, k)
            btoks = jnp.where(act_r[:, None], btoks, st["btoks"])
            bfin = jnp.where(act_r, bfin, st["bfin"])
            scores = jnp.where(act_r, scores, st["scores"])
            last = jnp.where(act_r, words, st["last"])

            gstep = st["gstep"] + active.astype(jnp.int32)
            all_fin = bfin.reshape(g, k).all(axis=1)
            still = active & ~all_fin & (gstep < l)

            # harvest view: best beam (row 0 after the sort), cut at its
            # first <eos>
            b0 = btoks.reshape(g, k, l)[:, 0]
            iseos = b0 == self.eos_id
            any_eos = iseos.any(axis=1)
            hsteps = jnp.where(any_eos, jnp.argmax(iseos, axis=1) + 1, gstep)
            toks = jnp.where(active[:, None], b0, st["toks"])
            steps = jnp.where(active, hsteps, st["steps"])

            return dict(st, dec=dec, last=last, scores=scores, bfin=bfin,
                        btoks=btoks, gstep=gstep, steps=steps,
                        active=still, toks=toks), None

        state, _ = jax.lax.scan(micro, state, None, length=self.step_chunk)
        return state

    # ----------------------------------------------- scheduler ops protocol

    def encode_admit(self, feats: np.ndarray, ids: np.ndarray,
                     valid: np.ndarray, opts=None) -> None:
        self._admit_count += 1
        chunk_rng = jax.random.fold_in(self._rng, self._admit_count)
        new_dec = self._jit_encode(self.params, jnp.asarray(feats), chunk_rng)
        if self._sample:
            a = ids.shape[0]
            row_keys = jax.random.split(
                jax.random.fold_in(self._sample_base, self._admit_count), a)
            t0, k0, p0 = self._row_defaults
            temp = np.full((a,), t0, np.float32)
            topk = np.full((a,), k0, np.int32)
            topp = np.full((a,), p0, np.float32)
            # a request that DOES carry opts starts from the pool's sampling
            # config — or neutral (T=1, no top_k/top_p) when the pool is
            # greedy-by-default — NOT from the greedy argmax trick (1, 1, 0):
            # otherwise ?temperature=5 against a greedy-default pool would
            # keep top_k=1 and silently stay greedy
            bt, bk, bp = ((self.sample_temperature, self.sample_top_k,
                           self.sample_top_p)
                          if self.sample_temperature > 0 else (1.0, 0, 0.0))
            for j, o in enumerate(opts or []):
                if not o:
                    continue
                # sanitize defensively — this runs on the scheduler thread,
                # where an exception kills the whole daemon: clamp top_k into
                # int32 (np assignment would raise OverflowError past 2^31),
                # and catch non-finite/<=0 temperature via `not (t > 0)`
                # (NaN fails every comparison, so a plain `t <= 0` would let
                # NaN through to the logits)
                t = float(o.get("temperature", bt))
                topk[j] = min(max(int(o.get("top_k", bk)), 0), 2**31 - 1)
                p = float(o.get("top_p", bp))
                temp[j] = t if np.isfinite(t) else 0.0
                topp[j] = p if 0.0 <= p <= 1.0 else 0.0
                if not (temp[j] > 0):  # "temperature 0" request = greedy
                    temp[j], topk[j], topp[j] = 1.0, 1, 0.0
            self.state = self._jit_admit(
                self.state, new_dec, jnp.asarray(ids), jnp.asarray(valid),
                jnp.asarray(row_keys, jnp.uint32),
                (jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp)))
        else:
            self.state = self._jit_admit(self.state, new_dec,
                                         jnp.asarray(ids), jnp.asarray(valid))

    def tick(self) -> None:
        self.state = self._jit_step(self._step_params, self.state)

    def poll_active(self) -> np.ndarray:
        return np.asarray(self.state["active"])

    def read_tokens(self) -> Tuple[np.ndarray, np.ndarray]:
        return np.asarray(self.state["toks"]), np.asarray(self.state["steps"])

    def check_feat_shape(self, shape) -> Optional[str]:
        """None if one request of this feature shape is admissible, else a
        reason string. The HTTP front end rejects bad shapes with a 400
        BEFORE they reach the scheduler thread — without this, the first
        request's shape was adopted blindly and a malformed first request
        (wrong rank/widths) crashed the encode and killed the daemon."""
        spec = self.spec
        if spec.arch == "spatial":
            if (len(shape) == 4 and shape[0] == spec.num_frames
                    and shape[1] == spec.vid_feat_size
                    and shape[2] == shape[3] and shape[2] >= 1):
                return None
            return (f"expected ({spec.num_frames}, {spec.vid_feat_size}, "
                    f"K, K) spatial grid features, got {tuple(shape)}")
        if tuple(shape) == (spec.num_frames, spec.vid_feat_size):
            return None
        return (f"expected ({spec.num_frames}, {spec.vid_feat_size}) "
                f"features, got {tuple(shape)}")

    def release_slots(self, ids: np.ndarray) -> None:
        """Deactivate slots whose requests were cancelled (client timed out /
        disconnected): their rows become dead weight until the next admission
        instead of decoding to max_len for nobody. Padded to a fixed (R,)
        shape with the drop sentinel so one compiled scatter covers every
        cancellation count."""
        padded = np.full((self.slots,), self.slots, np.int32)
        padded[: len(ids)] = ids
        self.state = self._jit_release(self.state, jnp.asarray(padded))

    # ------------------------------------------------------------ host loop

    def caption_stream(self, requests: Iterable[Tuple[object, np.ndarray]],
                       poll_cancelled=None
                       ) -> Iterator[Tuple[object, np.ndarray]]:
        """Drive the slot pool over a request stream — see
        :func:`run_slot_scheduler` for the protocol (poll markers, completion
        order, ``poll_cancelled`` slot reclamation). ``self.stats``
        accumulates scheduler observability across calls: occupancy =
        useful_steps / slot_steps is the fraction of slot-steps that produced
        a kept token (whole-batch serving's equivalent is mean_caption_len /
        max_len; continuous refilling keeps it higher on length-skewed
        workloads)."""
        return run_slot_scheduler(self, requests,
                                  poll_cancelled=poll_cancelled)

    def caption_all(self, feats_by_key: Dict[object, np.ndarray]
                    ) -> Dict[object, np.ndarray]:
        """Convenience: run a whole dict of requests to completion."""
        return dict(self.caption_stream(feats_by_key.items()))
