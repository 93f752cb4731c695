#!/usr/bin/env python
"""HTTP serving daemon: the Predictor behind a tiny stdlib HTTP API.

The reference's serving story is "run inference.py on a video file"
(/root/reference/inference.py:149-176). This is tpuseg's request/response
production counterpart: one process owns the chip and ONE compiled
model-size program (host cv2 preprocess makes the device program
upload-size independent, exactly like the video pipeline's
--infer.preprocess_on_host route), and clients POST images to get class
masks or the reference-semantics overlay back. stdlib http.server only —
no serving-framework dependency.

    python tools/serve.py --checkpoint checkpoints --port 8017
    python tools/serve.py --artifact exported/model.stablehlo --port 8017

    curl -s localhost:8017/healthz
    curl -s -X POST --data-binary @road.png localhost:8017/predict -o mask.png
    curl -s -X POST --data-binary @road.png 'localhost:8017/predict?format=json'
    curl -s -X POST --data-binary @road.png localhost:8017/overlay -o out.png

Endpoints:
    GET  /healthz              {"status":"ok", model, input_hw, requests}
    POST /predict              PNG uint8 class-id mask (image/png) at the
                               uploaded image's own size
    POST /predict?format=json  {"shape", "class_pixel_counts"}
    POST /predict?format=raw   octet-stream mask bytes + X-Shape header
                               (no host codec work; jpeg is refused — lossy
                               codecs corrupt class ids)
    POST /overlay              blended overlay PNG — road cleanup, car boxes
                               + distance labels, 0.6/0.4 blend (bitwise the
                               reference's inference.py:48-146 semantics);
                               car count in the X-Cars response header
    POST /overlay?format=jpeg[&quality=N]   lossy overlay (default q=90)
    POST /overlay?format=raw   octet-stream BGR bytes + X-Shape

Raw upload (codec-wall bypass on both directions, DESIGN §35: the 1-core
host's PNG codec is the concurrency ceiling): POST the pixel bytes with
Content-Type: application/octet-stream, X-Shape: "H,W,3" and optional
X-Pixel-Format: rgb|bgr (default bgr) — no cv2.imdecode on the server.

Request batching (``--max_batch N --batch_wait_ms W``, off at the default
N=1): concurrent requests coalesce into ONE device dispatch — a collator
thread drains the queue for up to W ms, stacks the host-preprocessed
inputs, pads to the next power-of-2 bucket (so only log2(N) programs ever
compile), and fans the class maps back out. On this host every dispatch
pays the ~50-100 ms tunnel round trip while the batch-8 forward itself is
~2 ms (BASELINE.md batch-1 row) — batching k concurrent requests divides
the dominant cost by k. Single requests still go straight through after W
ms (one queue wait, no extra dispatch). For bulk throughput on a video
file use inference.py's double-buffered pipeline (211-272 fps — BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_predictor(args):
    """Predictor with serving-friendly defaults: batch 1, host cv2
    preprocess (one compiled program for every upload size), host nearest
    upscale (fetch stays model-sized)."""
    from tpuseg.configs import ModelConfig
    from tpuseg.infer.predictor import Predictor

    cfg = ModelConfig(
        name=args.model,
        num_classes=args.num_classes,
        base_filters=args.base_filters,
        head_fp32=not args.bf16_head,
    )
    mean = (
        tuple(float(v) for v in args.normalize_mean.split(","))
        if args.normalize_mean else None
    )
    std = (
        tuple(float(v) for v in args.normalize_std.split(","))
        if args.normalize_std else None
    )
    return Predictor(
        cfg,
        checkpoint=args.checkpoint,
        artifact=args.artifact,
        input_hw=(args.height, args.width),
        batch_size=1,
        preprocess_on_host=True,
        upscale_on_host=True,
        normalize_mean=mean,
        normalize_std=std,
    )


class _State:
    """Shared across handler instances: the predictor, its lock (one chip,
    one program — requests serialize at the device), and counters."""

    def __init__(self, predictor, model_name: str, num_classes: int,
                 batcher=None):
        self.predictor = predictor
        self.model_name = model_name
        self.num_classes = num_classes
        self.lock = threading.Lock()
        self.requests = 0
        self.batcher = batcher

    def infer_model_sized(self, x):
        """One model-sized RGB frame [mh, mw, 3] -> class map [mh, mw]."""
        if self.batcher is not None:
            classes = self.batcher.submit(x)
        else:
            with self.lock:
                classes = self.predictor(x[None])[0]
        with self.lock:
            self.requests += 1
        return classes


class _Batcher:
    """Coalesces concurrent requests into one padded device dispatch.

    ``submit`` blocks the calling handler thread until its class map is
    ready. The collator waits up to ``wait_s`` after the first pending
    request for co-travelers, stacks up to ``max_batch`` model-sized
    frames, pads to the next power-of-2 bucket (so only log2 bucket
    programs compile — each is warmed at server start), dispatches ONCE,
    and fans results out. Tunnel math: every dispatch costs ~50-100 ms of
    round trip vs ~2 ms of batch-8 forward, so k coalesced requests cut
    per-request latency toward RTT/k + W.
    """

    def __init__(self, predictor, max_batch: int, wait_s: float):
        self.predictor = predictor
        self.max_batch = int(max_batch)
        self.wait_s = float(wait_s)
        self.q: "queue.Queue" = queue.Queue()
        self.dispatches = 0
        self.max_seen = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def warm_up(self, input_hw):
        """Compile every bucket program before the first client arrives."""
        import numpy as np

        h, w = input_hw
        top = self._bucket(self.max_batch)
        b = 1
        while True:
            self.predictor(np.zeros((b, h, w, 3), np.uint8))
            if b >= top:
                break
            b *= 2

    def submit(self, x):
        done = threading.Event()
        slot = {}
        self.q.put((x, done, slot))
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["classes"]

    def _loop(self):
        import time

        import numpy as np

        while True:
            first = self.q.get()
            batch = [first]
            deadline = time.monotonic() + self.wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            n = len(batch)
            # Everything that can raise lives inside the try: if assembly
            # (stack/pad) died outside it, this daemon thread would exit and
            # every pending submit() would block on done.wait() forever
            # while /healthz still reported ok.
            try:
                b = self._bucket(n)
                frames = np.stack(
                    [item[0] for item in batch]
                    + [np.zeros_like(batch[0][0])] * (b - n)
                )
                classes = self.predictor(frames)
                for i, (_, done, slot) in enumerate(batch):
                    slot["classes"] = classes[i]
                    done.set()
            except Exception as e:  # fan the failure out, keep serving
                for _, done, slot in batch:
                    if not done.is_set():
                        slot["error"] = f"{type(e).__name__}: {e}"
                        done.set()
            self.dispatches += 1
            self.max_seen = max(self.max_seen, n)


def _make_handler(state: _State):
    import cv2
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        # ThreadingHTTPServer + HTTP/1.1 keep-alive
        protocol_version = "HTTP/1.1"

        def _send(self, code: int, body: bytes, ctype: str, extra=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                return self._send_json(404, {"error": "unknown path"})
            h, w = state.predictor.input_hw
            info = {
                "status": "ok",
                "model": state.model_name,
                "input_hw": [h, w],
                "requests": state.requests,
            }
            if state.batcher is not None:
                info["batching"] = {
                    "max_batch": state.batcher.max_batch,
                    "wait_ms": state.batcher.wait_s * 1e3,
                    "dispatches": state.batcher.dispatches,
                    "max_seen_batch": state.batcher.max_seen,
                }
            self._send_json(200, info)

        def _read_image(self):
            length = int(self.headers.get("Content-Length", 0) or 0)
            if length <= 0:
                return None
            raw = self.rfile.read(length)
            # Raw-RGB upload path (codec-wall bypass, DESIGN §35: the 1-core
            # host's image codec is the serving ceiling): octet-stream body
            # + X-Shape "H,W,3" skips cv2.imdecode entirely. X-Pixel-Format
            # rgb|bgr (default bgr, matching what imdecode would produce).
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype == "application/octet-stream":
                shape = self.headers.get("X-Shape", "")
                try:
                    h, w, c = (int(v) for v in shape.split(","))
                except ValueError:
                    return None
                if c != 3 or h * w * c != len(raw):
                    return None
                frame = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
                if (self.headers.get("X-Pixel-Format", "bgr").lower()
                        == "rgb"):
                    frame = frame[..., ::-1]
                return np.ascontiguousarray(frame)
            frame_bgr = cv2.imdecode(
                np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR
            )
            return frame_bgr  # None if undecodable

        def _encode(self, img: np.ndarray, fmt: str, quality: int):
            """Encode a response image: png (default) | jpeg | raw.

            Returns (bytes, content_type, extra_headers) or None on an
            unknown format. raw = the array's own bytes + X-Shape, zero
            codec work — the other end of the codec wall."""
            if fmt == "png":
                ok, buf = cv2.imencode(".png", img)
                return buf.tobytes(), "image/png", ()
            if fmt in ("jpg", "jpeg"):
                ok, buf = cv2.imencode(
                    ".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality]
                )
                return buf.tobytes(), "image/jpeg", ()
            if fmt == "raw":
                return (
                    np.ascontiguousarray(img).tobytes(),
                    "application/octet-stream",
                    (("X-Shape", ",".join(str(s) for s in img.shape)),),
                )
            return None

        def do_POST(self):
            url = urlparse(self.path)
            if url.path not in ("/predict", "/overlay"):
                return self._send_json(404, {"error": "unknown path"})
            frame_bgr = self._read_image()
            if frame_bgr is None:
                return self._send_json(
                    400, {"error": "body is not a decodable image"}
                )
            # model input is RGB (the reference's BGR2RGB, inference.py:33)
            rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
            # model-size downscale HERE, on this handler thread (the same
            # cv2 INTER_LINEAR the Predictor's preprocess_on_host runs,
            # reference inference.py:28-46) — so batched requests of
            # different upload sizes stack into one dispatch, and the host
            # work parallelizes across request threads
            mh, mw = state.predictor.input_hw
            fh, fw = rgb.shape[:2]
            if (fh, fw) != (mh, mw):
                x = cv2.resize(rgb, (mw, mh), interpolation=cv2.INTER_LINEAR)
            else:
                x = rgb
            try:
                classes = state.infer_model_sized(x)
            except Exception as e:
                # both paths must answer with a 500 JSON body: the batcher
                # wraps failures in RuntimeError, but the direct batch-1
                # Predictor can raise anything — an escaped exception here
                # drops the connection instead of reporting the error
                return self._send_json(
                    500, {"error": f"{type(e).__name__}: {e}"}
                )
            if classes.shape != (fh, fw):
                from tpuseg.infer.predictor import upscale_nearest_host

                classes = upscale_nearest_host(classes[None], fh, fw)[0]
            qs = parse_qs(url.query)
            fmt = qs.get("format", ["png"])[0]
            quality = int(qs.get("quality", ["90"])[0])
            if url.path == "/predict":
                if fmt == "json":
                    counts = np.bincount(
                        classes.reshape(-1), minlength=state.num_classes
                    )
                    return self._send_json(200, {
                        "shape": list(classes.shape),
                        "class_pixel_counts": counts.tolist(),
                    })
                if fmt in ("jpg", "jpeg"):
                    # lossy codecs corrupt class IDS — refuse rather than
                    # silently return wrong labels
                    return self._send_json(400, {
                        "error": "jpeg is lossy; class masks support "
                                 "format=png|raw|json"})
                enc = self._encode(classes, fmt, quality)
                if enc is None:
                    return self._send_json(
                        400, {"error": f"unknown format {fmt!r}"})
                return self._send(200, enc[0], enc[1], extra=enc[2])
            # /overlay: the reference's full postprocess semantics
            from tpuseg.infer.postprocess import overlay_predictions

            blended, detected = overlay_predictions(frame_bgr, classes)
            enc = self._encode(blended, fmt, quality)
            if enc is None:
                return self._send_json(
                    400, {"error": f"unknown format {fmt!r}"})
            return self._send(
                200, enc[0], enc[1],
                extra=(("X-Cars", str(detected.get("cars", 0))),) + enc[2],
            )

        def log_message(self, fmt, *fmt_args):  # one quiet line per request
            sys.stderr.write(
                "serve: %s %s\n" % (self.command or "?", self.path)
            )

    return Handler


def make_server(args):
    """Build (httpd, state); warmed up — the first client request never
    pays a compile."""
    import numpy as np

    predictor = build_predictor(args)
    batcher = None
    max_batch = getattr(args, "max_batch", 1)
    if max_batch > 1:
        batcher = _Batcher(
            predictor, max_batch,
            getattr(args, "batch_wait_ms", 5.0) / 1e3,
        )
        # compile every bucket program up front
        batcher.warm_up(predictor.input_hw)
    else:
        # warm-up: compiles the one model-size program and proves the chain
        predictor(np.zeros((1, 64, 64, 3), np.uint8))
    state = _State(predictor, args.model, args.num_classes, batcher=batcher)
    httpd = ThreadingHTTPServer(
        (args.host, args.port), _make_handler(state)
    )
    return httpd, state


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="")
    p.add_argument("--artifact", default="")
    p.add_argument("--model", default="mobilenetv2_unet")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--base_filters", type=int, default=0)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--bf16_head", action="store_true")
    p.add_argument("--normalize_mean", default="")
    p.add_argument("--normalize_std", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8017)
    p.add_argument("--max_batch", type=int, default=1,
                   help=">1 coalesces concurrent requests into one device "
                        "dispatch (padded to power-of-2 buckets)")
    p.add_argument("--batch_wait_ms", type=float, default=5.0,
                   help="how long the collator waits for co-travelers "
                        "after the first pending request")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache()

    httpd, _ = make_server(args)
    host, port = httpd.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "model": args.model}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
