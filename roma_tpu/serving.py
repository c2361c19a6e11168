"""Production batch-matching engine: prefetch-overlapped, ICI-shardable.

The reference has no serving layer — its benchmarks match one pair at a
time from paths (romatch/benchmarks/megadepth_pose_estimation_benchmark.py:
25-58), leaving the GPU idle during every PIL decode/resize. This engine is
the TPU-native throughput path for matching large pair streams:

  * host preprocessing (decode, bicubic resize to the model's two static
    resolutions, ImageNet normalize) runs in a thread pool, ``prefetch``
    batches ahead of the device;
  * each batch is ONE jitted two-pass match (static shapes — the final
    short batch is padded, results sliced);
  * with a ``jax.sharding.Mesh``, the pair batch is sharded over the
    ``data`` axis and GSPMD scales the match across chips — the same
    scheme the training step and sharded benchmarks use;
  * dispatch is asynchronous: up to ``inflight`` device batches are in
    the XLA queue while the host preps the next ones, so host and device
    never wait on each other.

Example::

    import roma_tpu
    from roma_tpu.serving import MatchEngine

    model = roma_tpu.roma_outdoor()
    engine = MatchEngine(model, batch_size=8)
    for r in engine.match_paths([("a0.jpg", "b0.jpg"), ("a1.jpg", "b1.jpg")]):
        matches, cert = model.sample(r.warp, r.certainty, num=5000)

Results stream in input order. ``r.warp`` / ``r.certainty`` are device
arrays (sample/to_pixel_coordinates consume them directly); nothing is
copied back to host unless the caller asks.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Sequence

import numpy as np

from .utils.image import imagenet_normalize, load_image, resize, to_array


@dataclasses.dataclass
class MatchResult:
    """One matched pair: index into the input stream + dense outputs.

    With ``on_error="skip"`` a failed pair yields ``warp is None`` and
    ``error`` set to the preprocessing exception instead of aborting the
    stream.
    """

    index: int
    im_A: object
    im_B: object
    warp: object       # (H, W, 4) or (H, 2W, 4) symmetric — model convention
    certainty: object  # matching certainty map
    error: BaseException | None = None


class MatchEngineError(RuntimeError):
    """A pair failed host preprocessing; names the offending input."""

    def __init__(self, index: int, im_A, im_B, cause: BaseException):
        def name(x):
            return x if isinstance(x, str) else type(x).__name__

        super().__init__(
            f"pair {index} ({name(im_A)!r}, {name(im_B)!r}) failed "
            f"preprocessing: {cause!r}"
        )
        self.index = index
        self.cause = cause


def _prep(im, hw, normalize: bool = True) -> np.ndarray:
    x = to_array(resize(load_image(im), hw))
    return imagenet_normalize(x) if normalize else x


class MatchEngine:
    """Batched dense matcher over a pair stream.

    Args:
      model: a ``RegressionMatcher`` / ``TinyRoMa`` style matcher whose
        ``match(im_A, im_B, [im_*_high_res])`` accepts batched NHWC arrays.
      batch_size: pairs per device batch (per jitted program).
      mesh: optional 1-D ``jax.sharding.Mesh`` with a ``data`` axis; the
        pair batch is sharded across it. ``batch_size`` must divide by the
        mesh size.
      prefetch: host-side batches prepared ahead of dispatch.
      inflight: device batches allowed in the XLA queue before the engine
        blocks on the oldest result (bounds device memory).
      workers: decode/resize threads.
      resize_hw: fixed (h, w) to resize every image to, for matchers
        without a built-in canvas (TinyRoMa); big-RoMa matchers default to
        their own (h_resized, w_resized) + upsample_res.
      normalize: ImageNet-normalize on host (True for RegressionMatcher;
        False for TinyRoMa, which takes [0,1] images — reference
        tiny.py:72-79).
    """

    def __init__(
        self,
        model,
        batch_size: int = 8,
        mesh=None,
        prefetch: int = 2,
        inflight: int = 2,
        workers: int = 8,
        resize_hw: tuple[int, int] | None = None,
        normalize: bool = True,
    ):
        import jax

        if mesh is not None and batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {batch_size} must divide across the {mesh.size}-device mesh"
            )
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh
        self.prefetch = max(1, prefetch)
        self.inflight = max(1, inflight)
        self.workers = workers
        self.resize_hw = resize_hw
        self.normalize = normalize
        if resize_hw is None and not hasattr(model, "h_resized"):
            raise ValueError(
                "model has no built-in canvas (h_resized/w_resized); pass "
                "resize_hw=(h, w) — e.g. MatchEngine(tiny, resize_hw=(448, 640), "
                "normalize=False)"
            )
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P("data"))
        self._jax = jax

    # ------------------------------------------------------------------ #

    def _resolutions(self):
        m = self.model
        if self.resize_hw is not None:
            return self.resize_hw, None
        coarse_hw = (m.h_resized, m.w_resized)
        up_hw = m.upsample_res if getattr(m, "upsample_preds", False) else None
        return coarse_hw, up_hw

    def _prep_batch(self, pool: ThreadPoolExecutor, chunk: Sequence[tuple]):
        """Decode+resize+normalize a chunk of ((index, im_A, im_B)) on the
        pool. Returns ``(ok, failed, batch)``: the pairs that preprocessed,
        the ``(index, im_A, im_B, exception)`` tuples that did not, and the
        stacked arrays padded to batch_size (``None`` when nothing survived)."""
        coarse_hw, up_hw = self._resolutions()

        jobs = []
        for _, a, b in chunk:
            per_pair = [
                pool.submit(_prep, a, coarse_hw, self.normalize),
                pool.submit(_prep, b, coarse_hw, self.normalize),
            ]
            if up_hw is not None:
                per_pair += [
                    pool.submit(_prep, a, up_hw, self.normalize),
                    pool.submit(_prep, b, up_hw, self.normalize),
                ]
            jobs.append(per_pair)

        ok, failed, outs = [], [], []
        for pair, per_pair in zip(chunk, jobs):
            try:
                outs.append([j.result() for j in per_pair])
                ok.append(pair)
            except Exception as e:  # corrupt file, bad shape, IO error, ...
                failed.append((*pair, e))
        if not ok:
            return ok, failed, None

        pad = self.batch_size - len(outs)
        outs = outs + [outs[-1]] * pad
        batch = {
            "im_A": np.stack([o[0] for o in outs]),
            "im_B": np.stack([o[1] for o in outs]),
        }
        if up_hw is not None:
            batch["im_A_high_res"] = np.stack([o[2] for o in outs])
            batch["im_B_high_res"] = np.stack([o[3] for o in outs])
        return ok, failed, batch

    def _dispatch(self, batch: dict):
        jnp = self._jax.numpy
        if self._sharding is not None:
            batch = {
                k: self._jax.device_put(v, self._sharding) for k, v in batch.items()
            }
        kw = {
            k: jnp.asarray(batch[k], self.model.dtype)
            for k in ("im_A_high_res", "im_B_high_res")
            if k in batch
        }
        return self.model.match(
            jnp.asarray(batch["im_A"], self.model.dtype),
            jnp.asarray(batch["im_B"], self.model.dtype),
            **kw,
        )

    # ------------------------------------------------------------------ #

    def match_paths(
        self, pairs: Iterable[tuple], *, on_host: bool = False,
        on_error: str = "raise",
    ) -> Iterator[MatchResult]:
        """Match a stream of (im_A, im_B) pairs (paths, PIL images, or HWC
        arrays — anything ``utils.image.load_image`` takes). Yields
        ``MatchResult`` in input order.

        ``on_host=True`` converts warp/certainty to numpy before yielding
        (one device->host copy per batch, sliced per pair).

        ``on_error`` controls what a corrupt/undecodable input does:
        ``"raise"`` (default) raises :class:`MatchEngineError` naming the
        pair; ``"skip"`` keeps the stream alive and yields the failed pair
        as ``MatchResult(warp=None, certainty=None, error=exc)`` in order.
        Either way a bad pair never poisons its batch — the surviving pairs
        of the same chunk still match.
        """
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
        indexed = [(i, a, b) for i, (a, b) in enumerate(pairs)]
        if not indexed:
            return
        chunks = [
            indexed[i : i + self.batch_size]
            for i in range(0, len(indexed), self.batch_size)
        ]

        prepped: queue.Queue = queue.Queue(maxsize=self.prefetch)
        err: list[BaseException] = []

        def producer():
            try:
                with ThreadPoolExecutor(self.workers) as pool:
                    for chunk in chunks:
                        ok, failed, batch = self._prep_batch(pool, chunk)
                        if failed and on_error == "raise":
                            idx, a, b, e = failed[0]
                            raise MatchEngineError(idx, a, b, e)
                        prepped.put((ok, failed, batch))
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                prepped.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        # pending: (ok_pairs, failed_pairs, warp, certainty)
        pending: list[tuple] = []

        def drain_one():
            ok, failed, warp, certainty = pending.pop(0)
            if on_host and warp is not None:
                warp = np.asarray(warp)
                certainty = np.asarray(certainty)
            results = [
                MatchResult(idx, a, b, warp[i], certainty[i])
                for i, (idx, a, b) in enumerate(ok)
            ] + [
                MatchResult(idx, a, b, None, None, error=e)
                for idx, a, b, e in failed
            ]
            yield from sorted(results, key=lambda r: r.index)

        while True:
            item = prepped.get()
            if item is None:
                break
            ok, failed, batch = item
            warp = certainty = None
            if batch is not None:
                warp, certainty = self._dispatch(batch)
            pending.append((ok, failed, warp, certainty))
            if len(pending) > self.inflight:
                yield from drain_one()
        while pending:
            yield from drain_one()
        t.join()
        if err:
            raise err[0]
