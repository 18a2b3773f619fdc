#!/usr/bin/env python
"""Interactive detection-metrics GUI (web shell).

Re-build of the reference's PyQt5 metrics app (daod/src/ui/) as a local
zero-dependency web app over the same metric engines as
tools/metrics_tool.py. See simple_sfod_tpu/evaluation/gui.py.

Usage:
  python tools/metrics_gui.py [--host 127.0.0.1] [--port 8350]
then open the printed URL in a browser.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8350)
    args = ap.parse_args()

    from simple_sfod_tpu.evaluation.gui import run_server

    run_server(args.host, args.port)


if __name__ == "__main__":
    main()
