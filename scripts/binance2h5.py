"""Repo-root shim mirroring the reference's scripts/ layout
(/root/reference/scripts/binance2h5.py). The implementation lives in
``finmlkit_tpu.cli.binance2h5`` — this file only makes
``python scripts/binance2h5.py ...`` work from a checkout."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from finmlkit_tpu.cli.binance2h5 import *  # noqa: F401,F403
from finmlkit_tpu.cli.binance2h5 import _BASE, _COLS, _process_task, _writer, main  # noqa: F401

if __name__ == "__main__":
    sys.exit(main())
