#!/usr/bin/env python
"""Concurrency benchmark for the serving daemon's codec wall (DESIGN §35).

§35 measured the request-batching win (19.2 -> 40.75 req/s at 8 clients)
and identified the residual ceiling as the 1-core host's PNG codec. This
tool measures exactly that wall: it boots the REAL server (tools/serve.py
make_server) in-process, fires N concurrent clients through actual HTTP,
and reports req/s + latency percentiles per (upload codec, response
format) — so png vs raw upload and png/jpeg-qN/raw responses land as
comparable rows.

    python tools/serve_bench.py --clients 8 --requests 8 \
        [--upload png|raw] [--endpoint predict|overlay] \
        [--format png|jpeg|raw|json] [--quality 90] \
        [--upload_width 1280 --upload_height 720] [--max_batch 8] \
        [--checkpoint C] [--platform cpu]

Prints ONE JSON line: {"req_per_s", "p50_ms", "p90_ms", "n", "failures",
"bytes_up", "bytes_down", config...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_serve():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tpuseg_tool_serve_bench_target",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "serve.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


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
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_wait_ms", type=float, default=5.0)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=8,
                   help="requests per client")
    p.add_argument("--upload", default="png", choices=["png", "raw"])
    p.add_argument("--frame", default="noise", choices=["noise", "road"],
                   help="test frame content: 'noise' (incompressible — the "
                        "§40 worst case) or 'road' (realistic synthetic "
                        "scene, PNG-compressible like production footage)")
    p.add_argument("--upload_width", type=int, default=1280)
    p.add_argument("--upload_height", type=int, default=720)
    p.add_argument("--endpoint", default="predict",
                   choices=["predict", "overlay"])
    p.add_argument("--format", default="png",
                   choices=["png", "jpeg", "raw", "json"])
    p.add_argument("--quality", type=int, default=90)
    p.add_argument("--sweep", default="",
                   help="comma-separated upload:endpoint:format[:quality] "
                        "specs benchmarked against ONE server boot (each "
                        "boot is a TPU client cycle — CLAUDE.md spacing "
                        "hazard); prints one JSON line with a rows list. "
                        "Overrides --upload/--endpoint/--format/--quality.")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)

    from tpuseg.core.platform import env_platform_override

    platform = args.platform or env_platform_override()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from tpuseg.core.platform import enable_compile_cache

    enable_compile_cache()
    import cv2
    import numpy as np

    serve = _load_serve()
    ns = argparse.Namespace(**vars(args), host="127.0.0.1", port=0)
    httpd, _state = serve.make_server(ns)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    host, port = httpd.server_address[:2]
    base = f"http://{host}:{port}"

    # one upload frame shared by every request (the clients' encode cost is
    # not the server's wall; §35's protocol also reused one 720p PNG).
    # --frame road renders a realistic synthetic road scene — random noise
    # is PNG-incompressible, so with it the upload-codec axis isolates
    # decode cost only and overlay-PNG cost is worst-case (the DESIGN §40
    # caveat this flag closes).
    if args.frame == "road":
        from tpuseg.data.sources import SyntheticSource

        frame, _ = SyntheticSource(
            1, args.upload_width, args.upload_height, seed=11
        ).load(0)
        frame = np.ascontiguousarray(frame[:, :, ::-1])  # RGB -> BGR upload
    else:
        rng = np.random.RandomState(0)
        frame = rng.randint(
            0, 255, (args.upload_height, args.upload_width, 3), np.uint8
        )
    ok, png_buf = cv2.imencode(".png", frame)
    bodies = {
        "png": (png_buf.tobytes(), {}),
        "raw": (frame.tobytes(),
                {"Content-Type": "application/octet-stream",
                 "X-Shape": f"{frame.shape[0]},{frame.shape[1]},3"}),
    }

    def run_config(upload, endpoint, fmt, quality):
        body, headers = bodies[upload]
        url = f"{base}/{endpoint}?format={fmt}"
        if fmt == "jpeg":
            url += f"&quality={quality}"

        def one_request():
            req = urllib.request.Request(url, data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=600) as r:
                return len(r.read())

        one_request()  # settle lazy first-touch cost outside the clock

        lat = []
        down = [0]
        failures = [0]
        lock = threading.Lock()

        def client():
            for _ in range(args.requests):
                t = time.perf_counter()
                try:
                    nbytes = one_request()
                except Exception:
                    with lock:
                        failures[0] += 1
                    continue
                dt = time.perf_counter() - t
                with lock:
                    lat.append(dt)
                    down[0] += nbytes

        threads = [threading.Thread(target=client)
                   for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat.sort()
        n = len(lat)
        return {
            "req_per_s": round(n / wall, 2) if wall > 0 else 0.0,
            "p50_ms": round(lat[n // 2] * 1e3, 1) if n else None,
            "p90_ms": (round(lat[min(n - 1, int(n * 0.9))] * 1e3, 1)
                       if n else None),
            "n": n,
            "failures": failures[0],
            "bytes_up": len(body),
            "bytes_down": down[0] // max(n, 1),
            "upload": upload,
            "endpoint": endpoint,
            "format": fmt,
            "quality": quality if fmt == "jpeg" else None,
        }

    common = {
        "metric": "serve_concurrency",
        "clients": args.clients,
        "requests_per_client": args.requests,
        "max_batch": args.max_batch,
        "upload_hw": [args.upload_height, args.upload_width],
        "frame": args.frame,
    }
    if args.sweep:
        rows = []
        for spec in args.sweep.split(","):
            parts = spec.strip().split(":")
            upload, endpoint, fmt = parts[:3]
            quality = int(parts[3]) if len(parts) > 3 else args.quality
            rows.append(run_config(upload, endpoint, fmt, quality))
        rec = {**common, "rows": rows}
        bad = sum(r["failures"] for r in rows)
    else:
        rec = {**common, **run_config(args.upload, args.endpoint,
                                      args.format, args.quality)}
        bad = rec["failures"]
    httpd.shutdown()
    httpd.server_close()
    print(json.dumps(rec))
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
