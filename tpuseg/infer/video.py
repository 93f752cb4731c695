"""Batched, double-buffered video inference pipeline.

The reference processes video strictly serially at batch 1: decode ->
preprocess -> forward -> postprocess -> display, one frame at a time
(inference.py:151-173). The TPU-shaped replacement (SURVEY.md §3.2):

    reader thread:   decode + BGR->RGB + batch assembly  -> bounded queue
    device:          ONE jitted program per batch (resize+normalize+forward+
                     argmax+nearest-upscale), dispatched async
    main thread:     postprocess batch i-1 (cv2 morphology/CC/contours/blend)
                     WHILE the device runs batch i — classic double buffering

Per-class masks are identical to the frame-at-a-time path (same jitted fn,
batching only adds a leading dim) — the parity requirement of SURVEY.md §4.5.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, Iterator, Optional

import numpy as np

from tpuseg.infer.postprocess import overlay_predictions
from tpuseg.infer.predictor import Predictor

_STOP = object()


class VideoPipeline:
    def __init__(
        self,
        predictor: Predictor,
        road_cleanup: bool = True,
        car_boxes: bool = True,
        min_car_area: float = 300.0,
        blend_alpha: float = 0.4,
        pipeline_depth: int = 3,
    ):
        """``pipeline_depth``: batches in flight on the device before the
        host blocks on a fetch. Depth 1 is classic double buffering; deeper
        keeps the dispatch->execute->fetch round trips of consecutive
        batches overlapped, which matters when per-dispatch latency (not
        compute) is the wall. With the async device->host copies below,
        depth 3 took the demo 107.7 -> 209.7 fps on this host's remote-TPU
        tunnel (~85 ms/round trip; docs/DESIGN.md §19). Transient cost is
        ``depth + 1`` undelivered batches (the oldest flushes once `depth`
        newer ones are in flight): that many device output buffers
        (model-res uint8, ~0.5 MB each) plus their full-res host frame
        copies."""
        self.predictor = predictor
        self.pipeline_depth = max(1, pipeline_depth)
        self.post_kwargs = dict(
            road_cleanup=road_cleanup,
            car_boxes=car_boxes,
            min_car_area=min_car_area,
            blend_alpha=blend_alpha,
        )

    # -- single frame (reference-parity mode) -------------------------------

    def process_frame(self, frame_bgr: np.ndarray):
        """Frame-serial path, same semantics as reference inference.py."""
        rgb = frame_bgr[..., ::-1]
        out = self.predictor(np.ascontiguousarray(rgb[None]))
        if self.predictor.colorize_on_device:
            from tpuseg.ops.pallas_kernels import unpack_colors

            classes, packed = out
            return overlay_predictions(
                frame_bgr, classes[0],
                precolored_bgr=unpack_colors(packed[0]),
                **self.post_kwargs,
            )
        return overlay_predictions(frame_bgr, out[0], **self.post_kwargs)

    # -- batched video -------------------------------------------------------

    def _read_batches(self, cap, batch: int, out_q: queue.Queue, max_frames,
                      stop_ev: threading.Event):
        def put(item) -> bool:
            # bounded put that gives up when the consumer stopped (early
            # 'q' quit): a plain blocking put would leave this thread
            # parked on the full queue for the process lifetime
            while not stop_ev.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        frames = []
        n = 0
        while not stop_ev.is_set():
            ok, frame = cap.read()
            if not ok or (max_frames and n >= max_frames):
                break
            frames.append(frame)
            n += 1
            if len(frames) == batch:
                if not put(frames):
                    return
                frames = []
        if frames:
            put(frames)
        put(_STOP)

    def run(
        self,
        video_path: str,
        output_path: str = "",
        display: bool = False,
        max_frames: Optional[int] = None,
    ) -> Dict[str, float]:
        """Process a video file; returns {'frames', 'seconds', 'fps', 'cars'}."""
        import cv2

        cap = cv2.VideoCapture(video_path)
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot open video {video_path!r}")
        writer = None
        if output_path:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            fps_src = cap.get(cv2.CAP_PROP_FPS) or 30.0
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            writer = cv2.VideoWriter(output_path, fourcc, fps_src, (w, h))

        batch = self.predictor.batch_size
        q_in: queue.Queue = queue.Queue(maxsize=2)
        stop_reading = threading.Event()
        reader = threading.Thread(
            target=self._read_batches,
            args=(cap, batch, q_in, max_frames, stop_reading),
            daemon=True,
            name="tpuseg-video-reader",
        )
        reader.start()

        stats = {"frames": 0, "cars": 0}
        # Phase attribution (seconds): where the wall-clock goes. decode_wait
        # is time blocked on the reader thread; fetch_wait is the device
        # sync + device->host copy; post is cv2/native postprocess; write is
        # the output-video encode. They overlap the device, so they sum to
        # more than `seconds` only if the device is never the bottleneck.
        phases = {"decode_wait": 0.0, "fetch_wait": 0.0, "post": 0.0,
                  "write": 0.0}
        from collections import deque

        pending = deque()  # (frames_bgr, device_classes, n_valid) in flight
        stop = False

        def prepare(frames_list):
            """BGR frame list -> contiguous RGB batch array (+ true frame
            hw). With preprocess_on_host the cv2 downscale runs BEFORE the
            flip/stack so the host copies model-res bytes, not frame-res
            (the flip is channel-wise; it commutes with the spatial
            resize exactly)."""
            fh, fw = frames_list[0].shape[:2]
            if self.predictor.preprocess_on_host:
                import cv2 as _cv2

                mh, mw = self.predictor.input_hw
                rgb = np.stack(
                    [_cv2.resize(f, (mw, mh),
                                 interpolation=_cv2.INTER_LINEAR)
                     for f in frames_list]
                )[..., ::-1]
            else:
                rgb = np.stack(frames_list)[..., ::-1]
            return np.ascontiguousarray(rgb), (fh, fw)

        # Warm-up: compile the jitted program on the first batch BEFORE the
        # clock starts (first XLA compile is tens of seconds on this
        # backend and would dominate short clips) — prepared EXACTLY like
        # the steady-state batches so it hits the same jit cache key (a
        # mismatched warm-up would push a second compile inside the timed
        # region). The batch is then processed normally below.
        first = q_in.get()
        if first is not _STOP:
            pad = first + [first[-1]] * (batch - len(first))
            rgb0, fhw0 = prepare(pad)
            warm = self.predictor.predict_async(rgb0, out_hw=fhw0)
            np.asarray(warm[0] if isinstance(warm, tuple) else warm)
        t0 = time.perf_counter()

        colorized = self.predictor.colorize_on_device
        if colorized:
            from tpuseg.ops.pallas_kernels import unpack_colors

        def flush(entry):
            frames_bgr, dev_out, n_valid = entry
            t = time.perf_counter()
            if colorized:
                classes = np.asarray(dev_out[0])  # device sync happens HERE
                packed = np.asarray(dev_out[1])
            else:
                classes = np.asarray(dev_out)
            phases["fetch_wait"] += time.perf_counter() - t
            fh, fw = frames_bgr[0].shape[:2]
            if self.predictor.fetch_pack4:
                # fetched nibble pairs (half the tunnel bytes of the §19
                # model-res fetch) -> class ids; host cost is numpy shifts
                t = time.perf_counter()
                from tpuseg.infer.predictor import unpack4_host

                classes = unpack4_host(classes)
                phases["post"] += time.perf_counter() - t
            if classes.shape[1:] != (fh, fw):
                # upscale_on_host Predictor: the fetch was model-res (7x
                # fewer tunnel bytes); cv2 INTER_NEAREST here is
                # bit-identical to the device resize_nearest
                t = time.perf_counter()
                from tpuseg.infer.predictor import upscale_nearest_host

                classes = upscale_nearest_host(classes, fh, fw)
                if colorized:
                    packed = upscale_nearest_host(packed, fh, fw)
                phases["post"] += time.perf_counter() - t
            closed = None
            if self.predictor.device_close:
                # the device packed the 5x5 road morph-close into the class
                # map's high bit (zero extra fetch bytes); split it out so
                # the host postprocess keeps only the CC step
                t = time.perf_counter()
                closed = classes >= 0x80
                classes = classes & 0x7F
                phases["post"] += time.perf_counter() - t
            for i in range(n_valid):
                t = time.perf_counter()
                result, det = overlay_predictions(
                    frames_bgr[i],
                    classes[i],
                    precolored_bgr=unpack_colors(packed[i]) if colorized else None,
                    closed_road=closed[i] if closed is not None else None,
                    **self.post_kwargs,
                )
                phases["post"] += time.perf_counter() - t
                stats["frames"] += 1
                stats["cars"] += det["cars"]
                if writer is not None:
                    t = time.perf_counter()
                    writer.write(result)
                    phases["write"] += time.perf_counter() - t
                if display:
                    cv2.imshow("tpuseg", result)
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        return True
            return False

        item = first
        while True:
            if item is _STOP:
                break
            frames_bgr = item
            n_valid = len(frames_bgr)
            if n_valid < batch:  # pad last batch to keep shapes static
                frames_bgr = frames_bgr + [frames_bgr[-1]] * (batch - n_valid)
            rgb, fhw = prepare(frames_bgr)
            dev_out = self.predictor.predict_async(rgb, out_hw=fhw)
            # start the device->host copy as soon as compute finishes, so
            # the flush's np.asarray only waits, never initiates
            for arr in dev_out if isinstance(dev_out, tuple) else (dev_out,):
                arr.copy_to_host_async()
            pending.append((frames_bgr, dev_out, n_valid))
            # flush the oldest batch once `depth` NEWER ones are in flight:
            # up to depth+1 batches (and their host frame copies) exist
            # transiently, so depth=1 is classic double buffering
            if len(pending) > self.pipeline_depth:
                stop = flush(pending.popleft())
            if stop:
                break
            t = time.perf_counter()
            item = q_in.get()
            phases["decode_wait"] += time.perf_counter() - t
        while pending and not stop:
            stop = flush(pending.popleft())

        # clock stops BEFORE teardown: the reader join / release costs are
        # not processing time and would deflate the reported fps
        dt = time.perf_counter() - t0
        stop_reading.set()  # unblock a reader parked on the full queue
        reader.join(timeout=5)
        cap.release()
        if writer is not None:
            writer.release()
        if display:
            cv2.destroyAllWindows()
        stats["seconds"] = dt
        stats["fps"] = stats["frames"] / dt if dt > 0 else 0.0
        stats["phases"] = {k: round(v, 3) for k, v in phases.items()}
        # Tunnel-state acceptance criterion for recorded headlines: with the
        # async device->host copies, a healthy tunnel hides the fetch
        # entirely (fetch_wait ~1 ms/run, DESIGN §19) while a degraded one
        # shows up here first (0.84 s measured on the same program,
        # BASELINE.md 92-260 fps spread). A number from a run with
        # tunnel_ok=false is the tunnel's, not the pipeline's — re-run or
        # annotate (VERDICT r2 weak item 4).
        stats["tunnel_ok"] = phases["fetch_wait"] <= max(0.05 * dt, 0.05)
        # Diagnostic companion to the gate: throughput with the fetch stall
        # subtracted. On a healthy tunnel it equals fps (fetch_wait ~1 ms);
        # on a degraded one it estimates what the pipeline would do if the
        # tunnel weren't the wall (round-4 attempts drew fetch_wait
        # 0.001-0.85 s on the SAME build, minutes apart). Never a headline
        # — headlines come from tunnel_ok runs — but it makes a flaky-
        # tunnel A/B interpretable.
        stats["fps_ex_fetch"] = (
            stats["frames"] / max(dt - phases["fetch_wait"], 1e-6)
        )
        return stats

    def stream(self, frames_bgr: Iterator[np.ndarray]):
        """Generator API: yields (result_frame, detections) per input frame."""
        for frame in frames_bgr:
            yield self.process_frame(frame)
