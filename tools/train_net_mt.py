#!/usr/bin/env python
"""Mean-teacher / adaptation CLI (parity with the reference's train_net_mt.py,
a clone of train_net.py whose --eval-only path runs AdaBN refinement instead
of plain evaluation — train_net_mt.py:82)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from train_net import default_argument_parser, main  # noqa: E402

if __name__ == "__main__":
    main(default_argument_parser().parse_args(), eval_mode="adabn")
