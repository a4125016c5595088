"""Data-parallel serving: one process drives a whole TPU slice.

The reference's only scaling story is process-level data parallelism for
offline evaluation (pkg/evaluation/src/base.py:194-215 — N processes, one GPU
each). The TPU rebuild serves a slice from ONE process instead: the
MicroBatcher's coalesced waveform batch is sharded over the mesh ``data``
axis and every chip runs the full pipeline (frontend → encoder → beam
decode) on its local shard.

Why ``shard_map`` and not GSPMD sharding annotations: the serving configs
run Pallas kernels (attention, conv module, ln+dense), which are opaque
custom calls to the GSPMD partitioner — under plain ``jit`` with sharded
inputs they would force replication or fail. Inside ``shard_map`` each
device traces the per-shard program directly, so the kernels run as-is on
the local batch. Decode is embarrassingly data-parallel — no collectives;
the only ICI traffic is the initial batch scatter and the final gather of
token buffers.

``DataParallelDecoder`` satisfies the same ``decode_batch`` contract the
flavor containers expose, so it drops into :class:`serving.MicroBatcher`
unchanged:

    mesh = make_mesh(n_data=8)
    batcher = MicroBatcher(DataParallelDecoder(model, mesh), max_batch=256)
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ["DataParallelDecoder"]


class DataParallelDecoder:
    """Shard a container's batched decode over the mesh ``data`` axis.

    Args:
      model: a flavor container exposing ``decode_batch_fn()`` (nemo /
        espnet / k2 all do) — a pure ``(params, waveforms, lengths) ->
        per-element outputs`` closure over its static configs
      mesh: a :func:`parallel.mesh.make_mesh` mesh; only its ``data`` axis
        is used (params are replicated — serving models fit on one chip, so
        the model axis stays free for sequence parallelism elsewhere)

    Exposes the MicroBatcher model contract: ``decode_batch``,
    ``decode_single``, ``bucket_samples``, plus ``batch_multiple`` (batch
    sizes must divide evenly over the data axis — the MicroBatcher rounds
    its power-of-two batch buckets up to this).
    """

    def __init__(self, model, mesh):
        self.model = model
        self.mesh = mesh
        self.n_data = int(mesh.shape[DATA_AXIS])
        self.batch_multiple = self.n_data
        self.bucket_samples = getattr(model, "bucket_samples", 4 * 16000)

        fn = model.decode_batch_fn()
        # check_vma=False: the decode loops seed their while_loop carries
        # from constants (unvarying under the varying-manual-axes check) and
        # mix in shard data; the check would reject that, and there are no
        # collectives inside for it to protect — each shard is independent.
        sharded = jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
        self._jit = jax.jit(sharded)
        self._wav_sh = NamedSharding(mesh, P(DATA_AXIS))
        # replicate params across the slice once, up front
        self._params = jax.device_put(model.params, NamedSharding(mesh, P()))

    def __getattr__(self, name):
        # delegate everything else (tokenizer, rnnt_cfg, fe_cfg, ...) to the
        # wrapped container so flavor-level code — transcribe_batch(), the
        # evaluation examples, decode_hypothesis() — runs unchanged over the
        # slice. Only fires on attribute MISS, so the decoder's own state
        # (set in __init__) never recurses here.
        return getattr(self.model, name)

    def decode_batch(self, waveforms, lengths):
        """[B, N] float32 + [B] int32 -> host numpy per-element outputs
        (same tuple as the wrapped container's ``decode_batch``). Batches
        not divisible by the data axis are padded with empty rows (decoded
        as silence on the spare shards) and trimmed from the outputs."""
        waveforms = np.asarray(waveforms, np.float32)
        lengths = np.asarray(lengths, np.int32)
        b = waveforms.shape[0]
        b_pad = -(-b // self.n_data) * self.n_data
        if b_pad != b:
            waveforms = np.pad(waveforms, ((0, b_pad - b), (0, 0)))
            lengths = np.pad(lengths, (0, b_pad - b))
        wav = jax.device_put(
            jnp.asarray(waveforms, jnp.float32), self._wav_sh)
        lens = jax.device_put(jnp.asarray(lengths, jnp.int32), self._wav_sh)
        outs = self._jit(self._params, wav, lens)
        outs = tuple(np.asarray(x)[:b] for x in outs)
        post = getattr(self.model, "_host_decode_flags", None)
        if post is not None:
            post(outs)
        return outs

    def decode_single(self, waveform):
        """One utterance through the slice (pads the batch to the data
        axis; the other shards decode empty rows)."""
        n = len(waveform)
        padded = max(self.bucket_samples,
                     -(-n // self.bucket_samples) * self.bucket_samples)
        buf = np.zeros((self.n_data, padded), np.float32)
        lens = np.zeros(self.n_data, np.int32)
        buf[0, :n] = waveform
        lens[0] = n
        out = self.decode_batch(buf, lens)
        tokens, frames, counts = out[0], out[1], out[2]
        c = int(counts[0])
        return tokens[0, :c].tolist(), frames[0, :c].tolist()
