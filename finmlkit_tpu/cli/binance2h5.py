"""Installed console entry point for the binance2h5 acquisition CLI.

The implementation lives in scripts/binance2h5.py at the repo root (kept
there to mirror the reference layout, /root/reference/scripts/
binance2h5.py); when the package is installed without the repo, a copy
of the script ships inside the package.
"""
import importlib.util
import os
import sys


def _load():
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    for cand in (os.path.join(here, "scripts", "binance2h5.py"),
                 os.path.join(os.path.dirname(__file__), "_binance2h5_impl.py")):
        if os.path.exists(cand):
            spec = importlib.util.spec_from_file_location("_binance2h5", cand)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod
    raise ImportError("binance2h5 implementation not found")


def main():
    return _load().main()


if __name__ == "__main__":
    sys.exit(main())
