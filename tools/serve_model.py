#!/usr/bin/env python
"""Serve detections from an exported artifact (tools/export_model.py) over
HTTP — the deployment daemon the reference lacks (engine/serve.py).

Usage:
    python tools/serve_model.py --artifact model.sfodx [--port 8360]

    curl http://127.0.0.1:8360/                       # artifact info
    curl -X POST --data-binary @street.jpg \
        'http://127.0.0.1:8360/predict?min_score=0.5' # detections JSON
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8360)
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="micro-batch coalescing window: concurrent requests "
                   "arriving within it share one device call (engine/serve.py)")
    args = p.parse_args()

    from simple_sfod_tpu.utils.env import setup_cache

    setup_cache()
    from simple_sfod_tpu.engine.serve import DetectionService, make_server

    service = DetectionService(args.artifact, max_wait_ms=args.max_wait_ms)
    srv = make_server(service, args.host, args.port)
    info = service.info()
    print(
        f"serving {info['config'] or 'detector'} ({info['canvas'][0]}x{info['canvas'][1]} "
        f"canvas, platforms {info['platforms']}) on http://{args.host}:{srv.server_address[1]}/"
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
