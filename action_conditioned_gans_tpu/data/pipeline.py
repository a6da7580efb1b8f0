"""Dataset construction: config -> batch iterator.

Dispatches between the on-device synthetic source and the host-side
BAIR-style TFRecord reader (``data.tfrecord``). The TFRecord path performs
the reference's full input transform (SURVEY.md §4.3): parse per-timestep
features -> decode -> resize -> [0,1] -> [-1,1] -> action/state packing,
then double-buffers batches onto the device.
"""

from __future__ import annotations

import queue
import threading
from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.data.synthetic import SyntheticClips


def cast_frames(np_batch, frames_dtype: str):
    """Cast the "frames" leaf to ``data.device_dtype`` on the HOST, before
    placement — bf16 halves the host->device frame transfer and the frame
    HBM footprint. Actions/states stay float32 (negligible bytes)."""
    import numpy as np

    if frames_dtype in (None, "float32") or "frames" not in np_batch:
        return np_batch
    import ml_dtypes  # numpy bf16 support; a jax hard dependency

    dt = np.dtype(getattr(ml_dtypes, frames_dtype, frames_dtype))
    out = dict(np_batch)
    out["frames"] = np.asarray(out["frames"]).astype(dt)
    return out


def place_batch(np_batch, out_shardings, frames_dtype: str = "float32"):
    """Host batch -> device placement, multi-host aware (SURVEY.md §8
    hard-part 4; VERDICT r1 next-step 5).

    Single process: a plain sharded device_put. Multi-process: each process
    holds only its LOCAL batch shard (the per-host file reader yields
    batch_size/num_hosts clips), and
    ``jax.make_array_from_process_local_data`` assembles the global jax.Array
    the pjit/shard_map step expects — local shards stay on their host's
    devices; no cross-host data movement.
    """
    import jax
    import numpy as np

    np_batch = cast_frames(np_batch, frames_dtype)
    if out_shardings is None:
        # No placement requested: stay on the HOST. (Eagerly device-putting
        # here made StackSteps round-trip every sub-batch through the device
        # and back before the single real placement of the stacked array —
        # pure wasted transfer bandwidth on a tunneled TPU. jit transfers
        # host arrays exactly once at dispatch anyway.)
        return {k: np.asarray(v) for k, v in np_batch.items()}
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(out_shardings[k], np.asarray(v))
            for k, v in np_batch.items()
        }
    return {k: jax.device_put(v, out_shardings[k]) for k, v in np_batch.items()}


class Prefetcher:
    """Background-thread double buffering for host-side (file) sources.

    Overlaps TFRecord parse/decode/normalize + device_put with the device
    step (SURVEY.md §4.3: the rebuild's answer to TF queue runners). The
    on-device synthetic source never needs this — its batches are produced
    by the device itself.
    """

    def __init__(self, dataset, depth: int = 2):
        self._ds = dataset
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        i = 0
        try:
            while not self._stop.is_set():
                item = self._ds.batch_at(i)
                i += 1
                # Bounded put that re-checks the stop flag, so a dropped /
                # closed Prefetcher never leaves this thread blocked forever
                # on a full queue (VERDICT r1 weak item 7).
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surfaced on the consumer side
            self._err = e
            # Deliver the None error sentinel with the same stop-aware
            # bounded-put loop as data items: a single timed put could hit a
            # full queue (consumer inside a long dispatch/compile) and drop
            # the sentinel, leaving the consumer blocked forever while the
            # real exception sat unread in self._err.
            while not self._stop.is_set():
                try:
                    self._q.put(None, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def batch_at(self, index):
        del index  # stream-ordered, like the underlying file reader
        if self._stop.is_set():
            raise RuntimeError("Prefetcher is closed")
        # Timed get so a fill-thread death between sentinel attempts, a
        # cross-thread close(), or any missed wakeup surfaces instead of
        # hanging the consumer.
        while True:
            try:
                item = self._q.get(timeout=1.0)
                break
            except queue.Empty:
                if self._stop.is_set():
                    raise RuntimeError("Prefetcher is closed")
                if not self._thread.is_alive():
                    if self._err is not None:
                        raise self._err
                    raise RuntimeError(
                        "Prefetcher fill thread died without an error"
                    )
                continue
        if item is None:
            raise self._err  # type: ignore[misc]
        return item

    def close(self) -> None:
        """Stop the fill thread and release the underlying source. Idempotent."""
        self._stop.set()
        try:  # drain so a blocked put() exits promptly
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        inner_close = getattr(self._ds, "close", None)
        if inner_close is not None:
            inner_close()

    def __del__(self):
        try:
            if getattr(self, "_stop", None) is not None and not self._stop.is_set():
                self.close()
        except Exception:
            pass  # interpreter-shutdown ordering; nothing useful to do

    def __iter__(self):
        i = 0
        while True:
            yield self.batch_at(i)
            i += 1


class StackSteps:
    """Wrap a (B, ...)-batch host source into (k, B, ...) stacked batches
    for multi-step dispatch (TrainConfig.steps_per_call)."""

    def __init__(self, dataset, k: int, out_shardings=None):
        self._ds = dataset
        self._k = k
        self._shardings = out_shardings

    def close(self) -> None:
        inner_close = getattr(self._ds, "close", None)
        if inner_close is not None:
            inner_close()

    def batch_at(self, index):
        import numpy as np

        # Inner readers run with out_shardings=None and so return HOST
        # arrays (place_batch contract) — stack on host, place ONCE.
        parts = [self._ds.batch_at(index * self._k + j) for j in range(self._k)]
        out = {
            key: np.stack([np.asarray(p[key]) for p in parts]) for key in parts[0]
        }
        return place_batch(out, self._shardings)

    def __iter__(self):
        i = 0
        while True:
            yield self.batch_at(i)
            i += 1


def _wrap_host_source(ds, stack: int, out_shardings):
    if stack > 1:
        return Prefetcher(StackSteps(ds, stack, out_shardings))
    return Prefetcher(ds)


def make_dataset(
    cfg: Config,
    out_shardings=None,
    host_id: int = 0,
    num_hosts: int = 1,
    stack: int = 1,
    start_call: int = 0,
):
    """Build the training data iterator for a config.

    ``out_shardings``: optional NamedSharding pytree — synthetic batches are
    generated directly into their data-parallel layout.
    ``host_id``/``num_hosts``: multi-host sharding of the file set (each host
    reads a disjoint shard; SURVEY.md §8 hard-part 4).
    ``stack``: emit (stack, B, ...) batches for multi-step dispatch.
    ``start_call``: resume fast-forward — the number of ``batch_at`` calls
    the interrupted run already consumed. Synthetic data is index-addressed
    (the loop passes the call index), so it ignores this; the streaming file
    readers skip ``start_call * stack`` batches so a resumed run sees
    exactly the batches an uninterrupted run would see at the same step
    (VERDICT r2 missing 2).
    """
    d, t, m = cfg.data, cfg.train, cfg.model
    seq_len = t.rollout_length + 1
    # File sources on a multi-host mesh: each host reads its file shard AND
    # only its share of the global batch; place_batch assembles the global
    # array (SURVEY.md §8 hard-part 4).
    local_batch = t.batch_size
    if num_hosts > 1 and d.source != "synthetic":
        if t.batch_size % num_hosts:
            raise ValueError(
                f"batch_size={t.batch_size} must be divisible by "
                f"num_hosts={num_hosts} for file sources"
            )
        local_batch = t.batch_size // num_hosts
    if d.source == "synthetic":
        return SyntheticClips(
            batch=t.batch_size,
            seq_len=seq_len,
            image_size=m.image_size,
            action_dim=m.action_dim,
            with_state=True,
            seed=t.seed,
            out_shardings=out_shardings,
            stack=stack,
            frames_dtype=d.device_dtype,
        )
    if d.source == "tfrecord":
        from action_conditioned_gans_tpu.data import tfrecord

        return _wrap_host_source(tfrecord.TFRecordClips(
            data_dir=d.data_dir,
            batch=local_batch,
            seq_len=seq_len,
            image_size=m.image_size,
            action_dim=m.action_dim,
            state_dim=m.state_dim or 3,
            clip_len=d.clip_len,
            image_key=d.tfrecord_image_key,
            encoding=d.tfrecord_encoding,
            raw_image_size=d.raw_image_size,
            crop=d.crop,
            crop_random=d.crop_random,
            shuffle_buffer=d.shuffle_buffer,
            seed=t.seed,
            host_id=host_id,
            num_hosts=num_hosts,
            out_shardings=None if stack > 1 else out_shardings,
            start_batch=start_call * stack,
            frames_dtype=d.device_dtype,
        ), stack, out_shardings)
    if d.source == "tfrecord_native":
        from action_conditioned_gans_tpu.data import native_tfrecord

        return _wrap_host_source(native_tfrecord.NativeTFRecordClips(
            data_dir=d.data_dir,
            batch=local_batch,
            seq_len=seq_len,
            image_size=m.image_size,
            action_dim=m.action_dim,
            state_dim=m.state_dim or 3,
            clip_len=d.clip_len,
            image_key=d.tfrecord_image_key,
            encoding=d.tfrecord_encoding,
            raw_image_size=d.raw_image_size,
            crop=d.crop,
            crop_random=d.crop_random,
            shuffle_buffer=d.shuffle_buffer,
            seed=t.seed,
            host_id=host_id,
            num_hosts=num_hosts,
            out_shardings=None if stack > 1 else out_shardings,
            start_batch=start_call * stack,
            frames_dtype=d.device_dtype,
            decode_threads=d.decode_threads,
        ), stack, out_shardings)
    raise ValueError(f"unknown data source {d.source!r}")
