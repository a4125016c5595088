"""Continuous batching for the beam-transducer serving paths.

The reference serves its beam decodes one utterance at a time (espnet:
pkg/espnet-asr/src/transcribe.py:59-78; nemo reaches NeMo's per-call ALSD via
pkg/nemo-asr/src/transcribe.py:48-53). The static :class:`MicroBatcher`
already converts request concurrency into the batch dimension, but a beam
batch runs until its SLOWEST lane finishes: with mixed-length traffic most
lanes sit masked-idle for the tail of every batch, so goodput is bounded by
``mean_len / max_len`` of each tick's composition.

This executor removes that bound with lane recycling over a segmented beam:
the decoder state is a fixed pool of ``n_lanes`` lanes, each with its own
clock; every tick advances all lanes by one quantum, finished lanes are
finalized and immediately refilled from the request queue. Per-lane results
are bit-identical to a dedicated decode (the per-step/pop bodies have no
cross-lane ops — tests/test_graves_segment.py, tests/test_alsd_segment.py),
so continuous batching is a pure scheduling change. All transducer decode
flavors are supported through one adapter seam:

- **Graves beam-20** (espnet serving default,
  decoding/transducer_graves.py): lanes are frame-clocked; the quantum is
  ``frames_per_segment`` encoder frames and completion is the deterministic
  ``fidx >= lane_len``.
- **ALSD beam** (nemo serving default, decoding/rnnt_beam.py): lanes are
  alignment-step-clocked; the quantum is ``frames_per_segment`` steps,
  completion is data-dependent (the beam can die before the
  ``lane_len + floor(ratio*lane_len)`` step bound), so the device's per-lane
  ``done`` flag is fetched one tick behind — the fetch overlaps the next
  segment's compute — with the step bound as the deterministic fallback.
- **Greedy RNN-T** (k2 zipformer's pinned greedy_search plus the nemo/espnet
  ``decoding='greedy'`` option, decoding/rnnt_greedy.py): lanes are
  loop-iteration-clocked; completion is data-dependent (an iteration either
  advances a frame or emits), handled exactly like ALSD's lagged done flag
  with ``lane_len + emission_cap`` as the bound. The encode tick dispatches
  to the container's encoder (FastConformer or Zipformer2) by config type.

Device-interaction design (TPU-first):

- lane clocks are mirrored DETERMINISTICALLY on the host (the exact
  arithmetic of the device loop), so scheduling needs NO device→host
  readback on the critical path;
- the only sync points per tick are materializing finalized outputs and the
  (ALSD) lagged done flag, both issued AFTER the next segment is dispatched,
  so the transfers overlap device compute (JAX async dispatch);
- new requests are encoded in one jitted frontend→encoder→joint-projection
  call per tick and scattered straight into the per-lane enc-projection ring
  (a fixed encode shape by default — exactly one compiled encoder program;
  padded rows scatter out of bounds and are dropped).
"""

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import replace
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..decoding.rnnt_beam import (
    BeamDecodeConfig,
    alsd_finalize,
    alsd_segment,
    alsd_state_init,
    alsd_step_bound,
)
from ..decoding.rnnt_greedy import (
    GreedyDecodeConfig,
    greedy_finalize,
    greedy_segment,
    greedy_state_init,
    greedy_step_bound,
)
from ..decoding.transducer_graves import (
    GravesBeamConfig,
    graves_beam_segment,
    graves_finalize,
    graves_state_init,
)
from ..decoding.transducer_maes import (
    MAESBeamConfig,
    maes_beam_segment,
    maes_finalize,
    maes_state_init,
)
from ..frontend.features import log_mel_spectrogram, num_frames
from ..models.fastconformer import encoder_output_length, fastconformer_encode
from ..models.rnnt import joint_precompute_enc
from ..models.zipformer import (
    ZipformerConfig,
    zipformer_encode,
    zipformer_output_length,
)

__all__ = ["ContinuousBatcher"]


def _proj_from_wav(params, wav, lens, fe_cfg, enc_cfg, rnnt_cfg, t_buf, mvn):
    """frontend → encoder → joint enc-projection, padded/cropped to t_buf.

    The encoder is dispatched on the (static) config type: FastConformer for
    the nemo/espnet flavors, Zipformer2 for k2. ``mvn`` applies the espnet
    flavor's GlobalMVN between the frontend and the encoder."""
    feats, flens = log_mel_spectrogram(wav, lens, fe_cfg)
    if mvn:
        from ..espnet.asr.model import _apply_mvn

        feats = _apply_mvn(params, feats, flens)
    if isinstance(enc_cfg, ZipformerConfig):
        enc, elens = zipformer_encode(params["encoder"], feats, flens, enc_cfg)
    else:
        enc, elens = fastconformer_encode(
            params["encoder"], feats, flens, enc_cfg)
    proj = joint_precompute_enc(params["joint"], enc, rnnt_cfg)  # [M, t, J]
    t = proj.shape[1]
    if t < t_buf:
        proj = jnp.pad(proj, ((0, 0), (0, t_buf - t), (0, 0)))
    else:
        proj = proj[:, :t_buf]
    return proj, elens


@partial(jax.jit,
         static_argnames=("fe_cfg", "enc_cfg", "rnnt_cfg", "t_buf", "mvn"))
def _encode_into_ring(params, wav, lens, lanes, ring,
                      fe_cfg, enc_cfg, rnnt_cfg, t_buf, mvn):
    """:func:`_proj_from_wav` scattered into ring lanes.

    ``lanes`` rows for padding entries point out of bounds (index B) and are
    dropped by the scatter; every real write covers the lane's full
    ``t_buf`` rows, so stale frames from the lane's previous occupant never
    survive a swap.
    """
    proj, elens = _proj_from_wav(
        params, wav, lens, fe_cfg, enc_cfg, rnnt_cfg, t_buf, mvn)
    return ring.at[lanes].set(proj.astype(ring.dtype), mode="drop"), elens


class _GravesAdapter:
    """Frame-clocked segmented Graves beam (espnet flavor).

    ``segment_call``/``finalize_call`` take the param tree explicitly (never
    closed over — closure constants inflate compile payloads and defeat the
    mesh path's replicated-params device placement)."""

    mvn = True
    has_done_flag = False

    def __init__(self, model, t_buf):
        self.model = model
        self.cfg = (model.decode_cfg if model.decode_cfg.max_tokens > 0
                    else replace(model.decode_cfg, max_tokens=t_buf))

    def bound(self, lane_len: int) -> int:
        return int(lane_len)

    def state_init(self, params, n_lanes):
        del params
        return graves_state_init(n_lanes, self.model.rnnt_cfg, self.cfg)

    def segment_call(self, params, ring, lane_len, reset, state, n):
        state = graves_beam_segment(
            params["predictor"], params["joint"], ring, lane_len, reset,
            state, self.model.rnnt_cfg, self.cfg, n)
        return state, state.fidx >= lane_len

    def finalize_call(self, state, lane_len):
        tokens, frames, counts, _, _ = graves_finalize(
            state, lane_len, self.model.rnnt_cfg, self.cfg)
        return tokens, frames, counts


class _MAESAdapter:
    """Frame-clocked segmented mAES beam (espnet ``decoding="maes"`` — the
    alignment-synchronous opt-in; same lane contract as the Graves adapter,
    bit-identical to a dedicated whole-utterance decode per lane
    (tests/test_maes_beam.py::test_segmented_matches_whole))."""

    mvn = True
    has_done_flag = False

    def __init__(self, model, t_buf):
        self.model = model
        self.cfg = (model.decode_cfg if model.decode_cfg.max_tokens > 0
                    else replace(model.decode_cfg, max_tokens=t_buf))

    def bound(self, lane_len: int) -> int:
        return int(lane_len)

    def state_init(self, params, n_lanes):
        return maes_state_init(
            params["predictor"], n_lanes, self.model.rnnt_cfg, self.cfg)

    def segment_call(self, params, ring, lane_len, reset, state, n):
        state = maes_beam_segment(
            params["predictor"], params["joint"], ring, lane_len, reset,
            state, self.model.rnnt_cfg, self.cfg, n)
        return state, state.fidx >= lane_len

    def finalize_call(self, state, lane_len):
        tokens, frames, counts, _ = maes_finalize(
            state, lane_len, self.model.rnnt_cfg, self.cfg)
        return tokens, frames, counts


class _ALSDAdapter:
    """Alignment-step-clocked segmented ALSD beam (nemo flavor)."""

    mvn = False
    has_done_flag = True

    def __init__(self, model, t_buf):
        self.model = model
        self.cfg = (model.decode_cfg if model.decode_cfg.max_tokens > 0
                    else replace(model.decode_cfg,
                                 max_tokens=alsd_step_bound(t_buf,
                                                            model.decode_cfg)))

    def bound(self, lane_len: int) -> int:
        return alsd_step_bound(lane_len, self.cfg)

    def state_init(self, params, n_lanes):
        return alsd_state_init(
            params["predictor"], n_lanes, self.model.rnnt_cfg, self.cfg)

    def segment_call(self, params, ring, lane_len, reset, state, n):
        return alsd_segment(
            params["predictor"], params["joint"], ring, lane_len, reset,
            state, self.model.rnnt_cfg, self.cfg, n)

    def finalize_call(self, state, lane_len):
        tokens, frames, counts, _ = alsd_finalize(
            state, lane_len, self.model.rnnt_cfg, self.cfg)
        return tokens, frames, counts


class _GreedyAdapter:
    """Loop-iteration-clocked segmented greedy RNN-T (decoding/rnnt_greedy.py).

    Serves every greedy transducer container through the same lane pool:
    nemo ``decoding='greedy'``, k2 Zipformer (the reference's pinned
    greedy_search, pkg/k2-asr/src/huggingface.py:73-83), espnet
    ``decoding='greedy'``. A greedy iteration either advances >=1 frame or
    emits one token, so the deterministic bound is
    ``lane_len + emission_cap`` (greedy_step_bound); the data-dependent
    ``done`` flag usually harvests far earlier — fetched one tick behind
    like ALSD's. MVN is detected from the param tree (only the espnet
    converter emits a ``normalize`` entry)."""

    has_done_flag = True

    def __init__(self, model, t_buf):
        self.model = model
        self.mvn = "normalize" in model.params
        self.cfg = (model.decode_cfg if model.decode_cfg.max_tokens > 0
                    else replace(model.decode_cfg, max_tokens=t_buf))

    def bound(self, lane_len: int) -> int:
        return greedy_step_bound(lane_len, self.cfg)

    def state_init(self, params, n_lanes):
        return greedy_state_init(
            params["predictor"], n_lanes, self.model.rnnt_cfg, self.cfg)

    def segment_call(self, params, ring, lane_len, reset, state, n):
        return greedy_segment(
            params["predictor"], params["joint"], ring, lane_len, reset,
            state, self.model.rnnt_cfg, self.cfg, n)

    def finalize_call(self, state, lane_len):
        return greedy_finalize(state, lane_len)


class ContinuousBatcher:
    """Lane-recycling executor for beam-decode flavor containers.

    Args:
      model: a flavor container whose ``decode_cfg`` selects the decode:
        :class:`GravesBeamConfig` (espnet ``EspnetTPUModel``),
        :class:`BeamDecodeConfig` (nemo ``NemoTPUModel`` with the ALSD
        serving default), or :class:`GreedyDecodeConfig` (k2
        ``K2TPUModel`` and the nemo/espnet greedy options)
      n_lanes: decoder lane-pool width (the effective batch size; every
        segment runs all lanes)
      frames_per_segment: the recycling quantum — encoder frames (Graves) or
        alignment steps (ALSD) each lane advances per tick. Smaller =
        finished lanes refill sooner but more per-tick dispatch overhead;
        32 frames ≈ 1.3 s of audio at espnet's 40 ms frame rate (ALSD takes
        ~2 steps per frame, so double it for a similar audio quantum).
      max_seconds: longest accepted utterance (longer audio belongs to the
        chunking transcribe layer, pkg/espnet-asr/src/transcribe.py:56-60)
      drain_timeout: close() waits this long for in-flight lanes
      max_encode_batch: at most this many new requests encode per tick —
        bounds the compiled encode-program set to power-of-two request
        counts <= this (a full-pool burst would otherwise compile an
        m_pad=n_lanes program per waveform bucket); excess requests join
        on the next tick, one segment later
      fixed_encode_shape: pad EVERY encode tick to
        (max_encode_batch, max_samples) — exactly ONE compiled encoder
        program. The right default for beam flavors: the decode loop, not
        the encoder, is the cost, so the wasted pad FLOPs are noise while a
        compile through the dev tunnel is ~30 s. Set False to bucket encode
        shapes organically (encoder-bound flavors at steady load).
      mesh: optional :func:`parallel.mesh.make_mesh` mesh — the lane pool is
        sharded over its ``data`` axis, so ONE executor (and one HTTP
        server) spans a whole TPU slice. Segments run under ``shard_map``
        (the per-lane beam bodies have no cross-lane ops, and the Pallas
        decode kernels are opaque to the GSPMD partitioner — same rationale
        as parallel/serving.py); the encode tick shards its request batch
        over ``data`` and the ring scatter is a plain GSPMD jit (lanes land
        on whichever chip owns them). Requires ``n_lanes`` and
        ``max_encode_batch`` divisible by the data-axis size. Per-request
        results remain bit-identical to the single-device executor
        (tests/test_continuous_serving.py::test_mesh_matches_single_device).

    Results resolve to ``(token_ids, frames)`` — the MicroBatcher contract —
    and are bit-identical to ``decode_single`` under the same
    ``max_tokens`` emission cap (the pool shares one cap; dedicated decodes
    default theirs to their own padded T).
    """

    def __init__(self, model, n_lanes=16, frames_per_segment=32,
                 max_seconds=20.0, drain_timeout=300.0,
                 max_encode_batch=16, fixed_encode_shape=True, mesh=None,
                 max_pending=None):
        self.model = model
        # backpressure: submit() raises queue.Full beyond this many queued
        # (not-yet-laned) requests; None = unbounded (the HTTP front maps
        # it to 503 + Retry-After)
        self.max_pending = max_pending
        self.n_lanes = int(n_lanes)
        self.n_frames = int(frames_per_segment)
        self.bucket_samples = getattr(model, "bucket_samples", 2 * 16000)
        self.max_samples = int(
            -(-max_seconds * 16000 // self.bucket_samples)
            * self.bucket_samples)
        self.t_buf = int(self.host_frames(self.max_samples))
        if isinstance(model.decode_cfg, GravesBeamConfig):
            self._ad = _GravesAdapter(model, self.t_buf)
        elif isinstance(model.decode_cfg, MAESBeamConfig):
            self._ad = _MAESAdapter(model, self.t_buf)
        elif isinstance(model.decode_cfg, BeamDecodeConfig):
            self._ad = _ALSDAdapter(model, self.t_buf)
        elif isinstance(model.decode_cfg, GreedyDecodeConfig):
            self._ad = _GreedyAdapter(model, self.t_buf)
        else:
            raise TypeError(
                "ContinuousBatcher drives a segmented transducer decode; the "
                "container's decode_cfg must be a GravesBeamConfig or "
                "MAESBeamConfig (espnet), BeamDecodeConfig (nemo ALSD), or "
                "GreedyDecodeConfig "
                f"(nemo/k2/espnet greedy), got "
                f"{type(model.decode_cfg).__name__}.")
        self.cfg = self._ad.cfg
        self.drain_timeout = drain_timeout
        self.max_encode_batch = int(max_encode_batch)
        self.fixed_encode_shape = bool(fixed_encode_shape)
        self.mesh = mesh

        j = model.rnnt_cfg.joint_hidden
        if mesh is not None:
            self._init_mesh(mesh)
        else:
            self._params = model.params
        self._ring = jnp.zeros((self.n_lanes, self.t_buf, j), jnp.float32)
        self._state = self._ad.state_init(self._params, self.n_lanes)
        if mesh is not None:
            self._ring = jax.device_put(self._ring, self._lane_sh)
            self._state = jax.device_put(self._state, self._lane_sh)
        # COPY-ON-WRITE invariant: self._lane_len is REPLACED, never mutated
        # in place. jnp.array(np_buf)'s host->device fill can execute
        # deferred under a busy async dispatch queue (measured on the CPU
        # backend: a dispatched segment's lane_len buffer held a value the
        # host wrote AFTER the jnp.array call), so any numpy array handed to
        # JAX must be immutable from then on. _set_lane_len enforces this.
        self._lane_len = np.zeros(self.n_lanes, np.int32)
        self._fidx = np.zeros(self.n_lanes, np.int32)
        self._bound = np.zeros(self.n_lanes, np.int32)
        self._lane_fut = [None] * self.n_lanes
        # lagged device done flags (ALSD): the flag fetched this tick was
        # computed by the PREVIOUS tick's segment; a lane refilled since then
        # carries a stale True, masked by _done_skip for exactly one fetch
        self._done_host = np.zeros(self.n_lanes, bool)
        self._done_pending = None
        self._done_skip = np.zeros(self.n_lanes, bool)

        self._queue = queue.Queue()
        self._closing = False
        # observability
        self.segments = 0
        self.encode_ticks = 0
        self.encode_shapes = []  # (m_pad, samples) per encode dispatch
        # observability (stats()): rolling request latencies + lane busyness.
        # The lock guards iteration (stats() sorts the deque from an HTTP
        # thread) against concurrent appends from the executor thread —
        # mutating a deque mid-iteration raises RuntimeError.
        self._lat_lock = threading.Lock()
        self.latencies = deque(maxlen=1024)
        self.busy_lane_segments = 0
        self.requests_done = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _init_mesh(self, mesh):
        """Shard the lane pool over the mesh ``data`` axis (see class doc)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        n_data = int(mesh.shape[DATA_AXIS])
        if self.n_lanes % n_data:
            raise ValueError(
                f"n_lanes={self.n_lanes} must divide over the mesh data "
                f"axis ({n_data})")
        if self.max_encode_batch % n_data:
            raise ValueError(
                f"max_encode_batch={self.max_encode_batch} must divide over "
                f"the mesh data axis ({n_data})")
        dspec = P(DATA_AXIS)
        self._lane_sh = NamedSharding(mesh, dspec)
        # replicate params across the slice once, up front
        self._params = jax.device_put(
            self.model.params, NamedSharding(mesh, P()))

        m = self.model
        fe_cfg, enc_cfg, rnnt_cfg = m.fe_cfg, m.enc_cfg, m.rnnt_cfg
        t_buf, mvn, ad, n = self.t_buf, self._ad.mvn, self._ad, self.n_frames

        def proj_fn(params, wav, lens):
            proj, _ = _proj_from_wav(
                params, wav, lens, fe_cfg, enc_cfg, rnnt_cfg, t_buf, mvn)
            return proj

        # check_vma=False: the decode while_loops seed carries from constants
        # and mix in shard data (same rationale as parallel/serving.py); every
        # shard is independent — no collectives to protect.
        proj_sm = jax.jit(jax.shard_map(
            proj_fn, mesh=mesh, in_specs=(P(), dspec, dspec),
            out_specs=dspec, check_vma=False))
        scatter = jax.jit(
            lambda ring, lanes, proj: ring.at[lanes].set(
                proj.astype(ring.dtype), mode="drop"),
            out_shardings=self._lane_sh)

        def encode(params, wav, lens, lanes, ring):
            proj = proj_sm(params, wav, lens)
            return scatter(ring, lanes, proj)

        self._mesh_encode = encode
        self._mesh_segment = jax.jit(jax.shard_map(
            lambda params, ring, lane_len, reset, state:
                ad.segment_call(params, ring, lane_len, reset, state, n),
            mesh=mesh, in_specs=(P(), dspec, dspec, dspec, dspec),
            out_specs=(dspec, dspec), check_vma=False))
        self._mesh_finalize = jax.jit(jax.shard_map(
            ad.finalize_call, mesh=mesh, in_specs=(dspec, dspec),
            out_specs=dspec, check_vma=False))

    # -- public API ---------------------------------------------------------

    def submit(self, waveform) -> Future:
        """Enqueue one float32 waveform; resolves to (token_ids, frames).
        Raises queue.Full synchronously when ``max_pending`` requests are
        already waiting for a lane (shed load at the door, don't build an
        unbounded backlog)."""
        self._check_pending()
        fut = Future()
        w = np.asarray(waveform, np.float32)
        if len(w) > self.max_samples:
            fut.set_exception(ValueError(
                f"utterance of {len(w)} samples exceeds the executor's "
                f"max_seconds window ({self.max_samples} samples); chunk "
                "long audio through the transcribe layer"))
            return fut
        fut._submit_t = time.perf_counter()
        self._queue.put((w, fut))
        return fut

    def _check_pending(self):
        """Front-door backpressure: raise queue.Full beyond max_pending.
        Checked ONCE per request — a long request's windows are then
        enqueued unconditionally (shedding part of a window plan would
        break the merged result)."""
        if (self.max_pending is not None
                and self._queue.qsize() >= self.max_pending):
            raise queue.Full(
                f"{self._queue.qsize()} requests already queued for the "
                f"lane pool (max_pending={self.max_pending}); retry later")

    def _submit_window(self, w) -> Future:
        """Enqueue one already-validated window, bypassing backpressure."""
        fut = Future()
        fut._submit_t = time.perf_counter()
        self._queue.put((w, fut))
        return fut

    def transcribe(self, waveform):
        return self.submit(waveform).result()

    def submit_long(self, waveform, overlap_seconds=None) -> Future:
        """Long audio through the lane pool: ``max_seconds`` windows sharing
        ``overlap_seconds`` of context, each submitted as ordinary lane work
        (concurrent, interleaved with other traffic — one long request never
        monopolizes the pool), merged by keeping each window's center region.
        Same merge rule as nemo.asr.transcribe._decode_chunked: tokens in an
        overlap half belong to the neighbor with more context; the kept
        ranges partition the global timeline exactly. Audio that fits one
        window delegates to :meth:`submit` unchanged.

        Resolves to ``(token_ids, frames)`` with frames on the global
        encoder-frame grid of the whole waveform. The flavor transcribe()
        APIs remain the reference-faithful long-form paths (espnet cuts at
        CTC blank midpoints, pkg/espnet-asr/src/transcribe.py:59-78); the
        serving merge trades those data-dependent boundaries for fixed
        overlapped windows so the window set is known up front.
        """
        w = np.asarray(waveform, np.float32)
        if len(w) <= self.max_samples:
            return self.submit(w)
        self._check_pending()  # once per request, not per window
        starts, chunk, overlap = self._window_plan(len(w), overlap_seconds)
        futs = [self._submit_window(w[s:s + chunk]) for s in starts]

        out = Future()
        remaining = [len(starts)]
        lock = threading.Lock()

        def _gather(_fut):
            with lock:
                remaining[0] -= 1
                if remaining[0]:
                    return
            try:
                tokens, frames = [], []
                for i, (s, f) in enumerate(zip(starts, futs)):
                    toks, frs = self._window_keep(
                        *f.result(), i=i, start=s, starts=starts,
                        chunk=chunk, overlap=overlap, w_len=len(w))
                    tokens += toks
                    frames += frs
                out.set_result((tokens, frames))
            except Exception as e:  # a failed window fails the request
                out.set_exception(e)

        for f in futs:
            f.add_done_callback(_gather)
        return out

    def stream(self, waveform, overlap_seconds=None):
        """Incremental long-form decode: a generator yielding one
        ``(token_ids, frames)`` increment per window, in order, each as soon
        as its lane work (and its predecessors') completes — later windows
        keep decoding while earlier results are already out. Concatenating
        every yield equals :meth:`submit_long`'s result exactly. The serving
        analogue of the v1 flavor's streaming generator
        (pkg/reazonspeech/src/reazonspeech/transcribe.py — yields caption
        segments while the rest of the audio is still decoding).

        Submission is EAGER: the window plan is enqueued (and queue.Full
        raised) when stream() is called, before the first yield — an HTTP
        front can commit to its 200 status before iterating.
        """
        w = np.asarray(waveform, np.float32)
        if len(w) <= self.max_samples:
            futs, starts, chunk, overlap = [self.submit(w)], [0], len(w), 0
        else:
            self._check_pending()  # once per request, not per window
            starts, chunk, overlap = self._window_plan(
                len(w), overlap_seconds)
            futs = [self._submit_window(w[s:s + chunk]) for s in starts]

        def _deliver():
            for i, (s, f) in enumerate(zip(starts, futs)):
                toks, frs = f.result(timeout=self.drain_timeout)
                if len(futs) == 1:
                    yield toks, frs  # single window: no filtering, == submit
                else:
                    yield self._window_keep(
                        toks, frs, i=i, start=s, starts=starts, chunk=chunk,
                        overlap=overlap, w_len=len(w))

        return _deliver()

    def _window_plan(self, w_len, overlap_seconds):
        """Fixed overlapped max_seconds windows covering a w_len waveform."""
        sr = 16000
        chunk = self.max_samples
        if overlap_seconds is None:
            # TranscribeConfig.chunk_overlap_seconds' 4 s default, clamped
            # to half the window so small pools still chunk
            overlap_seconds = min(4.0, chunk / sr / 2)
        overlap = int(overlap_seconds * sr)
        hop = chunk - overlap
        if hop <= 0:
            raise ValueError(
                f"overlap_seconds={overlap_seconds} must be shorter than "
                f"the executor's max_seconds window ({chunk / sr:.1f}s)")
        return list(range(0, max(w_len - overlap, 1), hop)), chunk, overlap

    def _window_keep(self, toks, frs, *, i, start, starts, chunk, overlap,
                     w_len):
        """Center-keep filter + global-grid rebase for window i's tokens."""
        sr = 16000
        spf = self.seconds_per_frame()
        half = overlap / 2 / sr
        chunk_sec = min(chunk, w_len - start) / sr
        keep_lo = 0.0 if i == 0 else half
        keep_hi = chunk_sec if i == len(starts) - 1 else chunk_sec - half
        tokens, frames = [], []
        for tok, fr in zip(toks, frs):
            t_local = fr * spf
            if keep_lo <= t_local < keep_hi:
                tokens.append(int(tok))
                frames.append(int(round((t_local + start / sr) / spf)))
        return tokens, frames

    def seconds_per_frame(self) -> float:
        """Encoder frame period in seconds on the host lane-clock grid
        (0.08 for the FastConformer flavors, 0.04 for Zipformer). The
        difference quotient cancels the frontend/subsampling edge constants,
        so this is the exact steady-state grid period."""
        return 16.0 / (self.host_frames(32 * 16000)
                       - self.host_frames(16 * 16000))

    def host_frames(self, n_samples: int) -> int:
        """Encoder frames the device will report for an n_samples utterance
        (the deterministic host mirror the lane clocks run on)."""
        f = num_frames(self.model.fe_cfg, int(n_samples))
        if isinstance(self.model.enc_cfg, ZipformerConfig):
            return int(zipformer_output_length(f, self.model.enc_cfg))
        return int(encoder_output_length(f, self.model.enc_cfg))

    def warmup(self, seconds=(2.0, 5.0, 10.0, 15.0, 20.0)):
        """Compile the encode buckets + segment + finalize programs before
        taking traffic (one dummy request per waveform bucket). Accepts a
        single duration or an iterable of them; returns the warmed
        (1, samples) shapes — the same contract as MicroBatcher.warmup,
        which serve()'s --warmup log line relies on. With
        ``utils/compile_cache`` enabled, a restarted server reloads the
        warmed programs in milliseconds instead of recompiling."""
        if isinstance(seconds, (int, float)):
            seconds = (seconds,)
        rng = np.random.default_rng(0)
        warmed = []
        for s in seconds:  # sequential: stays under any max_pending bound
            n = int(min(s * 16000, self.max_samples))
            self.submit(
                rng.standard_normal(n).astype(np.float32) * 0.01).result(
                    timeout=self.drain_timeout)
            warmed.append((1, n))
        return warmed

    def stats(self) -> dict:
        """Operational snapshot for monitoring (the HTTP front's /healthz):
        segment/encode counters, queue depth, mean lane occupancy over all
        segment ticks, and rolling per-request latency percentiles."""
        with self._lat_lock:
            lat = sorted(self.latencies)
        pct = (lambda q: round(lat[min(len(lat) - 1,
                                       int(q * len(lat)))], 3)) if lat else (
            lambda q: None)
        return {
            "segments": self.segments,
            "encode_ticks": self.encode_ticks,
            "queue_depth": self._queue.qsize(),
            "lanes": self.n_lanes,
            "lane_occupancy": (
                round(self.busy_lane_segments / (self.segments * self.n_lanes),
                      3) if self.segments else 0.0),
            "requests_done": self.requests_done,
            "latency_s": {"p50": pct(0.50), "p95": pct(0.95),
                          "p99": pct(0.99)},  # rolling last-1024 window
        }

    def close(self):
        self._closing = True
        self._queue.put(None)
        self._thread.join(timeout=self.drain_timeout)

    # -- internals ----------------------------------------------------------

    def _set_lane_len(self, lanes, values):
        """Replace self._lane_len with an updated COPY (see __init__: the
        previous array may back an in-flight deferred device fill)."""
        ll = self._lane_len.copy()
        ll[lanes] = values
        self._lane_len = ll

    def _collect(self, n_free, block):
        """Pull up to n_free queued requests; optionally block for the first."""
        items = []
        while len(items) < n_free:
            try:
                item = self._queue.get(block=block and not items)
            except queue.Empty:
                break
            if item is None:  # shutdown marker: note it, keep draining
                self._closing = True
                if not block:
                    break
                if items:
                    break
                return items  # idle + closing -> caller exits
            items.append(item)
            block = False
        return items

    def _swap_in(self, items, lanes):
        """Encode new utterances and scatter them into their lanes' rings."""
        m = len(items)
        if self.fixed_encode_shape:
            m_pad = self.max_encode_batch
            samples = self.max_samples
        else:
            m_pad = 1 << (m - 1).bit_length()
            n_max = max(len(w) for w, _ in items)
            samples = max(self.bucket_samples,
                          -(-n_max // self.bucket_samples)
                          * self.bucket_samples)
        buf = np.zeros((m_pad, samples), np.float32)
        lens = np.zeros(m_pad, np.int32)
        lane_idx = np.full(m_pad, self.n_lanes, np.int32)  # OOB -> dropped
        for i, (w, _) in enumerate(items):
            buf[i, : len(w)] = w
            lens[i] = len(w)
            lane_idx[i] = lanes[i]
        m_cfg = self.model
        if self.mesh is not None:
            self._ring = self._mesh_encode(
                self._params, jnp.asarray(buf), jnp.asarray(lens),
                jnp.asarray(lane_idx), self._ring)
        else:
            self._ring, _ = _encode_into_ring(
                self._params, buf, lens, lane_idx, self._ring,
                m_cfg.fe_cfg, m_cfg.enc_cfg, m_cfg.rnnt_cfg, self.t_buf,
                self._ad.mvn)
        self.encode_ticks += 1
        self.encode_shapes.append((m_pad, samples))
        self._set_lane_len(
            list(lanes), [self.host_frames(len(w)) for w, _ in items])
        for (w, fut), lane in zip(items, lanes):
            self._lane_fut[lane] = fut
            self._fidx[lane] = 0
            self._bound[lane] = self._ad.bound(self.host_frames(len(w)))
            self._done_host[lane] = False
            # flags already in flight predate this swap — mask them once
            self._done_skip[lane] = self._done_pending is not None

    def _lane_done(self, lane: int) -> bool:
        return (self._fidx[lane] >= self._bound[lane]
                or bool(self._done_host[lane]))

    def _loop(self):
        while True:
            try:
                occupied = any(f is not None for f in self._lane_fut)
                # 1. harvest finished lanes (dispatch finalize; materialize
                #    AFTER the next segment is in flight)
                finished = [
                    l for l in range(self.n_lanes)
                    if self._lane_fut[l] is not None and self._lane_done(l)
                ]
                fin = None
                if finished:
                    # self._lane_len is copy-on-write (__init__), so this
                    # handoff is safe even though finalize's host->device
                    # fill may run after the zeroing below
                    if self.mesh is not None:
                        outs = self._mesh_finalize(
                            self._state, jnp.array(self._lane_len))
                    else:
                        outs = self._ad.finalize_call(
                            self._state, jnp.array(self._lane_len))
                    fin = (outs, [(l, self._lane_fut[l]) for l in finished])
                    self._set_lane_len(finished, 0)
                    for l in finished:
                        self._lane_fut[l] = None
                        self._fidx[l] = 0
                        self._bound[l] = 0
                        self._done_host[l] = False
                    occupied = any(f is not None for f in self._lane_fut)

                # 2. refill free lanes from the queue
                free = [l for l in range(self.n_lanes)
                        if self._lane_fut[l] is None]
                block = not occupied and fin is None
                if block and self._closing and self._queue.empty():
                    return
                n_take = min(len(free), self.max_encode_batch)
                new = self._collect(n_take, block) if free else []
                if block and not new and fin is None:
                    if self._closing:
                        return
                    continue  # spurious wake; block again
                reset = np.zeros(self.n_lanes, bool)
                if new:
                    lanes = free[: len(new)]
                    self._swap_in(new, lanes)
                    reset[lanes] = True

                # 3. advance every lane by one segment
                if any(f is not None for f in self._lane_fut):
                    if self.mesh is not None:
                        self._state, done_dev = self._mesh_segment(
                            self._params, self._ring,
                            jnp.array(self._lane_len), jnp.array(reset),
                            self._state)
                    else:
                        self._state, done_dev = self._ad.segment_call(
                            self._params, self._ring,
                            jnp.array(self._lane_len), jnp.array(reset),
                            self._state, self.n_frames)
                    if not self._ad.has_done_flag:
                        done_dev = None
                    self._fidx = np.minimum(
                        self._fidx + self.n_frames, self._bound)
                    self.segments += 1
                    self.busy_lane_segments += int(sum(
                        f is not None for f in self._lane_fut))
                else:
                    done_dev = None

                # 4. resolve finished futures (overlaps the running segment)
                if fin:
                    outs, recs = fin
                    tokens, frames, counts = (np.asarray(outs[0]),
                                              np.asarray(outs[1]),
                                              np.asarray(outs[2]))
                    now = time.perf_counter()
                    for l, fut in recs:
                        c = int(counts[l])
                        t0 = getattr(fut, "_submit_t", None)
                        if t0 is not None:
                            with self._lat_lock:
                                self.latencies.append(now - t0)
                        self.requests_done += 1
                        fut.set_result((tokens[l, :c].tolist(),
                                        frames[l, :c].tolist()))

                # 5. fetch the PREVIOUS tick's done flags (the segment that
                #    produced them has finished or is ahead of the one just
                #    dispatched, so this transfer overlaps compute), then
                #    queue this tick's flags for the next fetch
                if self._done_pending is not None:
                    got = np.asarray(self._done_pending)
                    keep = ~self._done_skip
                    self._done_host = (self._done_host | got) & keep
                    self._done_skip[:] = False
                    self._done_pending = None
                if done_dev is not None:
                    self._done_pending = done_dev
            except Exception as e:  # pragma: no cover - fan the error out
                for l in range(self.n_lanes):
                    fut = self._lane_fut[l]
                    if fut is not None and not fut.done():
                        fut.set_exception(e)
                    self._lane_fut[l] = None
                    self._fidx[l] = 0
                    self._bound[l] = 0
                self._lane_len = np.zeros(self.n_lanes, np.int32)
                self._done_host[:] = False
                self._done_skip[:] = False
                self._done_pending = None
                # Re-initialize the DEVICE state, not just host bookkeeping:
                # the fault (e.g. the round-3 ALSD kernel-fault class) may
                # have poisoned the beam arenas or left _state holding an
                # errored buffer — resuming on it would decode garbage into
                # the next occupants' lanes. If the device is still wedged
                # this raises too; the next tick's failure lands back here
                # and retries.
                try:
                    self._state = self._ad.state_init(
                        self._params, self.n_lanes)
                    self._ring = jnp.zeros(
                        (self.n_lanes, self.t_buf,
                         self.model.rnnt_cfg.joint_hidden), jnp.float32)
                    if self.mesh is not None:
                        self._state = jax.device_put(
                            self._state, self._lane_sh)
                        self._ring = jax.device_put(self._ring, self._lane_sh)
                except Exception:
                    pass
                while True:
                    try:
                        item = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if item is not None and not item[1].done():
                        item[1].set_exception(e)
                if self._closing:
                    return
                time.sleep(0.01)
