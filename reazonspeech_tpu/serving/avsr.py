"""Micro-batching executor for the AVSR (AV-HuBERT seq2seq) flavor.

The reference decodes AVSR one utterance at a time through HF ``generate``
(pkg/avsr/src/avhubert/modeling_avhubert.py:330-391). This executor converts
request concurrency into the batch dimension of ONE jitted beam-generate
call per tick — same policy as the ASR :class:`MicroBatcher`, adapted to the
two-modality input:

- requests carry fused audio features [T, F] and/or mouth-ROI video
  [T, 88, 88]; a missing modality is zero-filled per row, which is exactly
  the model's missing-modality semantics (avsr/model.py encode);
- the time axis pads to ``bucket_frames`` multiples and the batch dimension
  to powers of two, so the compiled-program set stays bounded under organic
  load (one program per (b_pad, t_pad) pair at fixed beam/max_length).
"""

import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

__all__ = ["AVSRBatcher"]


class AVSRBatcher:
    """Coalesce AVSR generate requests into batched beam decodes.

    Args:
      model: :class:`avsr.model.AVHubertForConditionalGeneration`
      max_batch: hard batch-size cap per tick
      max_wait_ms: how long the first request in a tick waits for company
      bucket_frames: time axis pads to multiples of this (25 fps fused
        frames; 50 = 2 s)
      num_beams / max_length: fixed generate config (one compiled program
        family; vary per batcher instance, not per request)
    """

    def __init__(self, model, max_batch=16, max_wait_ms=30.0,
                 bucket_frames=50, num_beams=5, max_length=128):
        self.model = model
        self.cfg = model.config
        self.max_batch = int(max_batch)
        self.max_wait_ms = max_wait_ms
        self.bucket_frames = int(bucket_frames)
        self.num_beams = int(num_beams)
        self.max_length = int(max_length)
        self._queue = queue.Queue()
        self._running = True
        self.batch_shapes = []  # (b_pad, t_pad) per dispatched tick
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, audio=None, video=None) -> Future:
        """Enqueue one utterance; resolves to eos-trimmed token ids.

        audio: [T, audio_feat_dim] fused log-fbank features (or None)
        video: [T, 88, 88] mouth-ROI frames (or None)
        """
        fut = Future()
        if audio is None and video is None:
            fut.set_exception(ValueError("need audio and/or video"))
            return fut
        a = None if audio is None else np.asarray(audio, np.float32)
        v = None if video is None else np.asarray(video, np.float32)
        if a is not None and v is not None and len(a) != len(v):
            fut.set_exception(ValueError(
                f"audio ({len(a)}) and video ({len(v)}) frame counts differ"))
            return fut
        self._queue.put((a, v, fut))
        return fut

    def generate(self, audio=None, video=None):
        return self.submit(audio, video).result()

    def warmup(self, seconds=4.0):
        """Pre-compile every batch-bucket beam-generate program for this
        utterance length (25 fps frames; same contract as
        MicroBatcher.warmup — serve()'s --warmup logs the result). Padding
        rows keep length 1, so all-silent warmup batches run the exact
        serving programs."""
        frames = int(seconds * 25)
        t_pad = max(self.bucket_frames,
                    -(-frames // self.bucket_frames) * self.bucket_frames)
        sizes = []
        b = 1
        while b < self.max_batch:
            sizes.append(b)
            b <<= 1
        sizes.append(self.max_batch)
        warmed = []
        for b_pad in sizes:
            audio = np.zeros((b_pad, t_pad, self.cfg.audio_feat_dim),
                             np.float32)
            video = np.zeros((b_pad, t_pad, 88, 88), np.float32)
            self.model.generate(
                audio=audio, video=video,
                lengths=np.ones((b_pad,), np.int32),
                num_beams=self.num_beams, max_length=self.max_length)
            warmed.append((b_pad, t_pad))
        self.warmed = warmed
        return warmed

    def close(self):
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=30)

    # -- internals -----------------------------------------------------------

    def _collect(self):
        first = self._queue.get()
        if first is None:
            return None
        items = [first]
        deadline = self.max_wait_ms / 1e3
        t0 = time.monotonic()
        while len(items) < self.max_batch:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)
                break
            items.append(nxt)
        return items

    def _loop(self):
        eos = self.cfg.eos_token_id
        f_dim = self.cfg.audio_feat_dim
        while self._running:
            items = self._collect()
            if items is None:
                return
            try:
                t_max = max(len(a) if a is not None else len(v)
                            for a, v, _ in items)
                t_pad = max(self.bucket_frames,
                            -(-t_max // self.bucket_frames)
                            * self.bucket_frames)
                b = len(items)
                b_pad = min(1 << (b - 1).bit_length(), self.max_batch)
                audio = np.zeros((b_pad, t_pad, f_dim), np.float32)
                video = np.zeros((b_pad, t_pad, 88, 88), np.float32)
                # padding rows keep length 1 (a zero-length encoder mask has
                # no valid key to attend to)
                lens = np.ones((b_pad,), np.int32)
                for i, (a, v, _) in enumerate(items):
                    n = len(a) if a is not None else len(v)
                    lens[i] = n
                    if a is not None:
                        audio[i, :n] = a
                    if v is not None:
                        video[i, :n] = v
                self.batch_shapes.append((b_pad, t_pad))
                toks = np.asarray(self.model.generate(
                    audio=audio, video=video, lengths=lens,
                    num_beams=self.num_beams, max_length=self.max_length))
                for i, (_, _, fut) in enumerate(items):
                    row = toks[i]
                    hits = np.nonzero(row == eos)[0]
                    end = int(hits[0]) if hits.size else len(row)
                    fut.set_result(row[:end].tolist())
            except Exception as e:  # pragma: no cover - fan the error out
                for _, _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
