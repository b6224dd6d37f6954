"""End-to-end dual-model WSI pipeline: tile → QC → classify → segment → rebuild.

The reference runs this as four separate scripts glued by bash
(``Segmentation/run_complete_pipeline.sh``) and never fuses the two models.
Here the cascade is one driver with a fused device path:

  1. upload the u8 slide once and gather the tile grid ON DEVICE
     (:func:`adipose_tpu.ops.blend.extract_tiles`; host tiling only for
     mesh-sharded runs);
  2. QC-filter tiles in device batches (:mod:`adipose_tpu.ops.qc`);
  3. classify tiles (InceptionV3) in device batches;
  4. segment only tiles classified adipose-positive (U-Net ± TTA) — negative
     tiles short-circuit to zero masks, saving the expensive 1024² U-Net pass;
  5. Gaussian-blend reconstruct the full-slide probability map.

This classify-then-segment gating is the TPU-native analog of the reference's
two-model workflow (classification finds candidate regions; segmentation
refines them — ``README.md`` workflow), expressed as one batched program chain.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

import cv2
import jax.numpy as jnp
import numpy as np

from adipose_tpu.ops.blend import (
    accumulate_predictions,
    accumulate_weights,
    extract_tiles,
    finalize_blend,
    finalize_blend_stripe,
    finalize_blend_u8,
    gaussian_weight_map,
    sliding_window_positions,
)
from adipose_tpu.ops.qc import classify_tiles_batch


@dataclass
class PipelineResult:
    probability_map: np.ndarray
    n_tiles: int
    n_good: int
    n_positive: int
    timings: dict
    # exact u8 PNG payload when transfer_dtype='uint8' (else None); already
    # quantized on device, so writers should emit it verbatim rather than
    # re-quantizing probability_map
    probability_u8: np.ndarray | None = None


@dataclass
class _PendingQC:
    """In-flight per-chunk state between :meth:`DualModelWSIPipeline._dispatch_qc`
    (QC+classify dispatched, stacked result download started async) and
    :meth:`DualModelWSIPipeline._plan_segment` (consumes the download to pick
    the positive tiles). Splitting here lets :meth:`run_many_iter` dispatch
    chunk k+1's QC before planning chunk k's segmentation, so the QC
    round-trip drains under device compute instead of stalling cold
    (VERDICT r3 item 6: 0.93–1.13 s in-pipeline vs 42.1 ms isolated)."""

    gray_shape: tuple
    h: int
    w: int
    n_tiles: int
    positions: np.ndarray
    qc_arr: object                 # (2, padded_n) device array, download started
    slide_dev: object | None       # device-tiling path
    tiles_host: np.ndarray | None  # host-tiling / mesh path
    use_device_tiling: bool
    timings: dict


@dataclass
class _PendingRun:
    """In-flight per-chunk state between :meth:`DualModelWSIPipeline._plan_segment`
    and :meth:`DualModelWSIPipeline._finish` (the run_many pipeline)."""

    gray_shape: tuple
    h: int
    w: int
    n_tiles: int
    n_good: int
    n_positive: int
    timings: dict
    acc: object            # device accumulator (sync handle in pipelined mode)
    stripes: list | None   # striped path: [(y0, stripe device array)], downloads started
    hs: int                # stripe height (striped path)
    out_arr: object | None  # mesh path: finalized map, async copy started


class DualModelWSIPipeline:
    def __init__(
        self,
        classifier_predict,  # (variables, gray_u8_batch (B,T,T)) -> (B,) probs
        classifier_variables,
        segmenter_predict,   # (params, gray_batch (B,T,T)) -> (B,T,T) probs
        segmenter_params,
        tile_size: int = 1024,
        overlap: float = 0.0,
        classifier_threshold: float = 0.5,
        batch_size: int = 16,  # U-Net 1024² throughput peaks at b16 on v5e (HBM-bound above)
        white_threshold: float = 235.0,
        white_ratio: float = 0.70,
        blur_threshold: float = 7.5,
        blend_sigma_factor: float = 0.25,
        mesh=None,
        transfer_dtype: str = "float16",  # 'float16' | 'float32' | 'uint8'
        device_tiling: bool = True,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — each QC/classify/segment
        chunk shards over the mesh 'data' axis, spreading one slide's tile
        stream across all chips (same spatial data parallelism as
        :class:`adipose_tpu.eval.sliding_window.SlidingWindowInference`)."""
        self.classifier_predict = classifier_predict
        self.classifier_variables = classifier_variables
        self.segmenter_predict = segmenter_predict
        self.segmenter_params = segmenter_params
        self.tile_size = tile_size
        self.overlap = overlap
        self.classifier_threshold = classifier_threshold
        self.mesh = mesh
        if mesh is not None:
            n = mesh.shape.get("data", 1)
            batch_size = -(-batch_size // n) * n  # round UP to the data axis
        self.batch_size = batch_size
        self.qc_args = (white_threshold, white_ratio, blur_threshold)
        self.weight_map = gaussian_weight_map(tile_size, blend_sigma_factor)
        # Final-map download precision. float16 halves the device->host
        # transfer (67 MB -> 33 MB for a 4096² slide — the dominant cost of
        # blend_s through the tunnel) at a quantization error <= 5e-4 on
        # [0,1] probabilities, inside the model-wide bf16 noise band
        # (DiffSigmoidHead docstring). 'float32' restores exact transfer.
        # 'uint8' quantizes to the PNG payload on device (16.8 MB; exact
        # w.r.t. the saved probability artifact, 1/255-step probability_map).
        self.transfer_dtype = transfer_dtype
        # Slide-resident tiling: upload the padded u8 slide ONCE and gather
        # each (B, T, T) tile chunk on device (ops.blend.extract_tiles).
        # Host tiling uploads every overlapping tile for QC/classify and the
        # positive subset AGAIN for segmentation — ~3x the slide's bytes at
        # 0.25 overlap. Device tiling moves the slide's bytes exactly once.
        # Mesh runs keep host tiling (chunks are device_put per-shard).
        self.device_tiling = device_tiling
        # per-instance jit cache: the fused QC+classify chunk program must
        # persist across run() calls or every slide recompiles it
        self._programs: dict = {}

    def _qc_classify_program(self, device_tiling: bool):
        """ONE fused program per tile chunk: gather → cast → QC → classify,
        stacked into a single (2, B) f32 result.

        Why fused: the per-stage dispatch chain plus per-chunk downloads made
        the QC+classify stage ~3× overhead-dominated (25 tiles at 4096²:
        124.7 ms as separate dispatches vs 42.1 ms fused with one stacked
        download — scripts/exp_profile_qc_stage.py, identical outputs). The
        classifier/QC callables are trace-aware dispatchers, so nesting them
        under this jit is safe (core/jitopts.py).
        """
        key = ("qc_classify", device_tiling)
        if key not in self._programs:
            import jax

            qc_args = self.qc_args
            tile = self.tile_size
            classifier_predict = self.classifier_predict

            def core(cf, variables):
                return jnp.stack([
                    classify_tiles_batch(cf, *qc_args)["is_good"].astype(jnp.float32),
                    classifier_predict(variables, cf).astype(jnp.float32),
                ])

            if device_tiling:
                def fn(slide_dev, pos, variables):
                    cf = extract_tiles(slide_dev, pos, tile).astype(jnp.float32)
                    return core(cf, variables)
            else:
                def fn(tiles, variables):
                    return core(tiles.astype(jnp.float32), variables)
            self._programs[key] = jax.jit(fn)
        return self._programs[key]

    def _segment_accumulate_program(self, device_tiling: bool):
        """ONE fused program per positive-tile chunk: gather → cast →
        segment → weighted scatter-add into the (donated) accumulator.

        Same rationale as :meth:`_qc_classify_program`: the unfused form is
        three dispatches per chunk (extract_tiles, segmenter, accumulate)
        with the (B, T, T) f32 prediction maps round-tripping HBM between
        programs. The segmenter callable is a trace-aware dispatcher
        (core/jitopts.py), so nesting it under this jit is safe; the inner
        accumulate's donation is inherited by donating ``acc`` here.
        """
        key = ("segment_accumulate", device_tiling)
        if key not in self._programs:
            import jax

            tile = self.tile_size
            segmenter_predict = self.segmenter_predict
            weight_map = self.weight_map

            def core(tiles_f32, params, acc, positions, valid):
                seg = segmenter_predict(params, tiles_f32)
                return accumulate_predictions(
                    acc, seg, positions, weight_map, valid)

            if device_tiling:
                def fn(acc, slide_dev, pos, params, valid):
                    cf = extract_tiles(slide_dev, pos, tile).astype(jnp.float32)
                    return core(cf, params, acc, pos, valid)
            else:
                def fn(acc, tiles, pos, params, valid):
                    return core(tiles.astype(jnp.float32), params, acc,
                                pos, valid)
            self._programs[key] = jax.jit(fn, donate_argnums=(0,))
        return self._programs[key]

    def _put(self, chunk: np.ndarray):
        if self.mesh is None:
            return jnp.asarray(chunk)
        import jax

        from adipose_tpu.parallel.mesh import data_sharding

        return jax.device_put(chunk, data_sharding(self.mesh, chunk.ndim))

    def run(self, image: np.ndarray) -> PipelineResult:
        return self._finish(self._dispatch(image, sync_segment=True))

    def run_many(self, images) -> list[PipelineResult]:
        """Run several chunks through a two-stage dispatch pipeline.

        A gigapixel WSI arrives as a sequence of ≤6144² chunks
        (``wsi/chunker.py``, mirroring
        ``pre-post-processing_tools/large_wsi_to_small_wsi_MS.py:486-514``);
        running them with back-to-back :meth:`run` calls serializes chunk
        k's host-side finalize (stripe downloads + canvas assembly,
        1.6–3.5 s at 6144² through the tunnel) against chunk k+1's compute.
        Here the per-chunk work is split at its one data dependency — the
        QC/classify download that picks the positive tiles — and staged:
        chunk k+1's QC is dispatched (download streaming async) BEFORE chunk
        k's segmentation is planned, and chunk k's segmentation is dispatched
        before chunk k-1's host assembly runs. The QC round-trip and the
        finalize downloads both drain under device compute. Outputs are
        identical to per-image :meth:`run` calls.

        Timing attribution shifts in pipelined mode (``pipelined: true`` in
        each chunk's timings): ``qc_classify_s``/``segment_s`` measure
        dispatch only; the QC consume wait shows up as ``qc_wait_s`` and the
        device-drain + download wait lands in ``blend_s``.
        """
        return list(self.run_many_iter(images))

    def run_many_iter(self, images):
        """Generator form of :meth:`run_many`: yields each chunk's
        :class:`PipelineResult` as soon as its successors are dispatched, so
        a caller can write chunk k's artifacts (and drop its canvas) while
        chunks k+1/k+2 compute — ``images`` may itself be a lazy generator
        (file reads then also overlap the device drain)."""
        pending_qc: _PendingQC | None = None
        pending_seg: _PendingRun | None = None
        for img in images:
            qc = self._dispatch_qc(img)
            if pending_qc is not None:
                seg = self._plan_segment(pending_qc, sync_segment=False)
                if pending_seg is not None:
                    yield self._finish(pending_seg)
                pending_seg = seg
            pending_qc = qc
        if pending_qc is not None:
            seg = self._plan_segment(pending_qc, sync_segment=False)
            if pending_seg is not None:
                yield self._finish(pending_seg)
            yield self._finish(seg)

    def _dispatch(self, image: np.ndarray, sync_segment: bool) -> _PendingRun:
        return self._plan_segment(self._dispatch_qc(image), sync_segment)

    def _dispatch_qc(self, image: np.ndarray) -> _PendingQC:
        """Stage 1: pad/tile the chunk, dispatch QC+classify, and START the
        stacked-result download (async). No device sync happens here."""
        t = self.tile_size
        timings = {}
        t0 = time.time()
        h, w = image.shape[:2]
        gray = image if image.ndim == 2 else cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        pad_h, pad_w = max(0, t - h), max(0, t - w)
        if pad_h or pad_w:
            gray = np.pad(gray, ((0, pad_h), (0, pad_w)), mode="reflect")
        gray_shape = gray.shape
        positions = np.asarray(
            sliding_window_positions(gray_shape, t, self.overlap), np.int32)
        n_tiles = len(positions)
        use_device_tiling = self.device_tiling and self.mesh is None
        slide_dev = tiles_host = None
        if use_device_tiling:
            # ONE u8 slide upload; every tile chunk is a device gather.
            slide_dev = jnp.asarray(gray)
        else:
            # Keep tiles in the source dtype (u8 for real slides):
            # host->device transfers are 4x smaller than f32, and every
            # consumer casts on device where the conversion is free.
            # Native memcpy gather (core/native.py, OpenMP) replaces the
            # Python per-tile slicing for u8 slides — exact, parity-tested.
            if gray.dtype == np.uint8:
                from adipose_tpu.core import native

                tiles_host = native.extract_tiles(gray, positions, t)
            else:
                tiles_host = np.stack(
                    [gray[y : y + t, x : x + t] for (y, x) in positions])
        timings["tiling_s"] = time.time() - t0

        # QC + classification: ONE tile chunk feeds both (the classifier
        # runs on every tile — at ~1k tiles/s that is cheaper than a second
        # pass over the good subset). One fused program per chunk, results
        # device-concatenated into a SINGLE async transfer — the
        # per-stage/per-chunk form was 3× dispatch/download-dominated
        # (see _qc_classify_program).
        t0 = time.time()
        prog = self._qc_classify_program(use_device_tiling)
        outs = []
        for idx, n in self._chunk_indices(np.arange(n_tiles)):
            if use_device_tiling:
                r = prog(slide_dev, jnp.asarray(positions[idx], jnp.int32),
                         self.classifier_variables)
            else:
                r = prog(self._put(tiles_host[idx]), self.classifier_variables)
            outs.append(r)
        qc_arr = jnp.concatenate(outs, axis=1)
        qc_arr.copy_to_host_async()
        timings["qc_classify_s"] = time.time() - t0

        return _PendingQC(
            gray_shape=gray_shape, h=h, w=w, n_tiles=n_tiles,
            positions=positions, qc_arr=qc_arr, slide_dev=slide_dev,
            tiles_host=tiles_host, use_device_tiling=use_device_tiling,
            timings=timings)

    def _chunk_indices(self, index_list):
        """Yield (b-padded index array, n valid) chunks."""
        b = self.batch_size
        for i in range(0, len(index_list), b):
            idx = index_list[i : i + b]
            n = len(idx)
            yield np.pad(idx, (0, b - n), mode="edge"), n

    def _plan_segment(self, qc_st: _PendingQC, sync_segment: bool) -> _PendingRun:
        """Stage 2: consume the QC/classify download, pick positive tiles,
        dispatch segmentation + blend finalize."""
        t = self.tile_size
        timings = qc_st.timings
        gray_shape = qc_st.gray_shape
        positions, n_tiles = qc_st.positions, qc_st.n_tiles
        b = self.batch_size
        use_device_tiling = qc_st.use_device_tiling
        slide_dev, tiles_host = qc_st.slide_dev, qc_st.tiles_host

        def get_tiles(idx):
            if use_device_tiling:
                return extract_tiles(
                    slide_dev, jnp.asarray(positions[idx], jnp.int32), t)
            return self._put(tiles_host[idx])

        def chunk_indices(index_list):
            return self._chunk_indices(index_list)

        t0 = time.time()
        # padded entries sit only at the tail of the last chunk (edge-pad),
        # so the flattened [:n_tiles] prefix is exactly the real tiles
        flat = np.asarray(qc_st.qc_arr)[:, :n_tiles]
        good = flat[0] > 0.5
        probs = np.where(good, flat[1], 0.0).astype(np.float32)
        positive = good & (probs >= self.classifier_threshold)
        timings["qc_wait_s"] = time.time() - t0

        # Segmentation on positive tiles only, blended INTO device-resident
        # canvases chunk by chunk — prediction maps never visit the host
        # (a 4096² slide round-trips 210 MB otherwise; the tunnel makes
        # that 3+ s of the old 8.5 s end-to-end).
        t0 = time.time()
        acc = jnp.zeros(gray_shape, jnp.float32)
        # The weight canvas depends only on the padded shape (positions and
        # chunking derive from it deterministically), not on pixel data —
        # cache it so a multi-chunk WSI (run_many over same-size chunks)
        # builds it once instead of once per chunk. Downstream programs
        # (finalize_blend*) only read it; nothing donates the cached array.
        # HBM note: each cached entry is one f32 canvas (~151 MB at 6144²);
        # a WSI's edge chunks produce a handful of distinct padded shapes, so
        # the cache is LRU-bounded to the 2 most recent shapes to keep
        # long-lived pipeline instances from pinning several canvases.
        wsum_key = ("wsum", gray_shape)
        wsum = self._programs.get(wsum_key)
        if wsum is None:
            wsum = jnp.zeros(gray_shape, jnp.float32)
            for idx, n in chunk_indices(np.arange(n_tiles)):
                wsum = accumulate_weights(
                    wsum, jnp.asarray(positions[idx], jnp.int32),
                    self.weight_map,
                    jnp.asarray(np.arange(b) < n, jnp.float32))
            wsum_keys = [k for k in self._programs
                         if isinstance(k, tuple) and k and k[0] == "wsum"]
            for stale in wsum_keys[:max(0, len(wsum_keys) - 1)]:
                del self._programs[stale]
            self._programs[wsum_key] = wsum
        else:
            # refresh recency: move to the end of insertion order
            del self._programs[wsum_key]
            self._programs[wsum_key] = wsum
        timings["blend_weights_s"] = time.time() - t0

        t0 = time.time()
        pos_idx = np.flatnonzero(positive)

        seg_prog = self._segment_accumulate_program(use_device_tiling)

        def segment_chunks(acc, on_chunk_done=None):
            """Shared per-chunk segment+accumulate loop (both finalize
            strategies), one fused program per chunk;
            ``on_chunk_done(done_count, acc)`` is the striped path's flush
            hook."""
            done = 0
            if on_chunk_done is not None:
                on_chunk_done(0, acc)
            for idx, n in chunk_indices(pos_idx):
                pos = jnp.asarray(positions[idx], jnp.int32)
                valid = jnp.asarray(np.arange(b) < n, jnp.float32)
                if use_device_tiling:
                    acc = seg_prog(acc, slide_dev, pos,
                                   self.segmenter_params, valid)
                else:
                    acc = seg_prog(acc, get_tiles(idx), pos,
                                   self.segmenter_params, valid)
                done += 1
                if on_chunk_done is not None:
                    on_chunk_done(done, acc)
            return acc

        # NOTE on timings: in the striped (mesh=None) path the final-map
        # device->host transfer overlaps segmentation, so segment_s absorbs
        # most of what the mesh path reports as blend_s; the 'striped' key
        # marks which attribution a log used. In pipelined (run_many) mode
        # segment_s is dispatch-side only — 'pipelined' marks that too.
        timings["striped"] = self.mesh is None
        timings["pipelined"] = not sync_segment
        stripes = None
        hs = gray_shape[0]
        out_arr = None
        if self.mesh is None:
            # Stripe-pipelined finalize+download: a canvas stripe
            # [y0, y0+hs) receives contributions only from tiles whose row
            # start is < y0+hs (rows at/below the bound start past it — the
            # same invariant as wsi/reconstruct.py striped blending), so it
            # can finalize — and start its device->host transfer — as soon
            # as the last positive chunk below the bound is dispatched.
            # Positive indices are row-major, so that is a chunk-count
            # prefix; the tunnel download of finished stripes then overlaps
            # the remaining segmentation compute instead of serializing
            # after it. All stripes share ONE static height (the tile-row
            # stride, with starts clamped to the canvas) so the finalize
            # program compiles exactly once — variable last-stripe heights
            # previously triggered up to 3 multi-minute remote compiles
            # mid-segmentation; clamped stripes overlap their predecessor
            # and finalize those rows to identical values.
            H = gray_shape[0]
            ys = positions[:, 0]
            row_starts = np.unique(ys)
            hs = int(row_starts[1] - row_starts[0]) if len(row_starts) > 1 else H
            y0s = np.unique(np.minimum(np.arange(0, H, hs), H - hs))
            need = np.ceil(
                np.searchsorted(ys[pos_idx], y0s + hs, side="left") / b
            ).astype(int)
            stripes = []
            next_s = 0

            # wsum updates are already enqueued ahead of any finalize; the
            # device executes in dispatch order, and a stripe read of `acc`
            # is enqueued before the next chunk's donating accumulate, so
            # donation cannot clobber it.
            def flush(done_chunks, acc_now):
                nonlocal next_s
                while next_s < len(y0s) and need[next_s] <= done_chunks:
                    y0 = int(y0s[next_s])
                    arr = finalize_blend_stripe(
                        acc_now, wsum, y0, hs, out_dtype=self.transfer_dtype)
                    arr.copy_to_host_async()
                    stripes.append((y0, arr))
                    next_s += 1

            acc = segment_chunks(acc, flush)
            # dispatch is async: block so segment_s measures segmentation
            # (stripe downloads keep streaming meanwhile); in pipelined mode
            # skip the sync — the next chunk's dispatch overlaps the drain
            if sync_segment:
                acc.block_until_ready()
            timings["segment_s"] = time.time() - t0
            timings["_blend_dispatch_s"] = 0.0  # stripes dispatched in-loop
        else:
            acc = segment_chunks(acc)
            # dispatch is async: block here so segment_s measures
            # segmentation, not the later finalize sync
            if sync_segment:
                acc.block_until_ready()
            timings["segment_s"] = time.time() - t0

            t0 = time.time()
            if self.transfer_dtype == "uint8":
                out_arr = finalize_blend_u8(acc, wsum)
            else:
                out_arr = finalize_blend(acc, wsum)
                if self.transfer_dtype == "float16":
                    out_arr = out_arr.astype(jnp.float16)
            out_arr.copy_to_host_async()
            timings["_blend_dispatch_s"] = time.time() - t0

        return _PendingRun(
            gray_shape=gray_shape, h=qc_st.h, w=qc_st.w, n_tiles=n_tiles,
            n_good=int(good.sum()), n_positive=int(positive.sum()),
            timings=timings, acc=acc, stripes=stripes, hs=hs,
            out_arr=out_arr)

    def _finish(self, st: _PendingRun) -> PipelineResult:
        """Host-side completion: wait for stripe/map downloads, assemble the
        canvas, close the timing attribution. Separated from
        :meth:`_dispatch` so :meth:`run_many` can overlap it with the next
        chunk's dispatch."""
        timings = st.timings
        t0 = time.time()
        prob_u8 = None
        if st.stripes is not None:
            buf = np.empty(st.gray_shape,
                           dtype=np.asarray(st.stripes[0][1]).dtype)
            for y0, arr in st.stripes:
                buf[y0 : y0 + st.hs] = np.asarray(arr)
            if self.transfer_dtype == "uint8":
                prob_u8 = buf[: st.h, : st.w]
                full = prob_u8.astype(np.float32) / 255.0
            else:
                full = buf[: st.h, : st.w].astype(np.float32)
        else:
            arr = np.asarray(st.out_arr)
            if self.transfer_dtype == "uint8":
                prob_u8 = arr[: st.h, : st.w]
                full = prob_u8.astype(np.float32) / 255.0
            else:
                full = arr[: st.h, : st.w].astype(np.float32)
        timings["blend_s"] = (time.time() - t0
                              + timings.pop("_blend_dispatch_s")
                              + timings.pop("blend_weights_s"))

        return PipelineResult(
            probability_map=full,
            n_tiles=st.n_tiles,
            n_good=st.n_good,
            n_positive=st.n_positive,
            timings=timings,
            probability_u8=prob_u8,
        )

    @staticmethod
    def _read_image(image_path: str | Path) -> np.ndarray:
        image = cv2.imread(str(image_path), cv2.IMREAD_UNCHANGED)
        if image is None:
            raise ValueError(f"cannot read {image_path}")
        if image.dtype == np.uint16:
            image = (image / 257.0).astype(np.uint8)
        # run()'s contract is grayscale-or-RGB; cv2.imread returns BGR(A).
        # Without this, color slides got channel-swapped luma (0.299 weight
        # on BLUE) — disagreeing with the builder/evaluator, which convert
        # BGR correctly — and BGRA PNGs crashed cvtColor downstream.
        if image.ndim == 3:
            code = cv2.COLOR_BGRA2RGB if image.shape[2] == 4 else cv2.COLOR_BGR2RGB
            image = cv2.cvtColor(image, code)
        return image

    @staticmethod
    def _write_outputs(image_path: str | Path, result: PipelineResult,
                       output_dir: str | Path, threshold: float) -> dict:
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        stem = Path(image_path).stem
        prob_png = (result.probability_u8 if result.probability_u8 is not None
                    else (np.clip(result.probability_map, 0, 1) * 255)
                    .astype(np.uint8))
        cv2.imwrite(str(out / f"{stem}_probability.png"), prob_png)
        cv2.imwrite(str(out / f"{stem}_mask.png"),
                    ((result.probability_map > threshold) * 255).astype(np.uint8))
        summary = {
            "chunk": stem,
            "n_tiles": result.n_tiles,
            "n_good": result.n_good,
            "n_positive": result.n_positive,
            "timings": result.timings,
        }
        (out / f"{stem}_pipeline_log.json").write_text(
            json.dumps(summary, indent=2))
        return summary

    def run_file(self, image_path: str | Path, output_dir: str | Path,
                 threshold: float = 0.5) -> PipelineResult:
        result = self.run(self._read_image(image_path))
        self._write_outputs(image_path, result, output_dir, threshold)
        return result

    def run_files(self, image_paths, output_dir: str | Path,
                  threshold: float = 0.5) -> list[dict]:
        """Chunk-directory driver: every file flows through the pipelined
        :meth:`run_many_iter` (chunk k+1's read+dispatch overlaps chunk k's
        download/assembly/writes); artifacts are written and canvases
        dropped as each chunk completes, so gigapixel chunk sets stream at
        constant host memory. Returns per-chunk summary dicts and writes a
        directory-level ``pipeline_log.json``."""
        paths = [Path(p) for p in image_paths]
        Path(output_dir).mkdir(parents=True, exist_ok=True)
        summaries = []
        t0 = time.time()
        lazy_reads = (self._read_image(p) for p in paths)
        for p, r in zip(paths, self.run_many_iter(lazy_reads)):
            summaries.append(self._write_outputs(p, r, output_dir, threshold))
        log = {
            "n_chunks": len(paths),
            "total_s": time.time() - t0,
            "n_tiles": sum(s["n_tiles"] for s in summaries),
            "n_positive": sum(s["n_positive"] for s in summaries),
            "chunks": summaries,
        }
        (Path(output_dir) / "pipeline_log.json").write_text(
            json.dumps(log, indent=2))
        return summaries
