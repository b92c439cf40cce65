"""Env-configured logging.

Parity: /root/reference/finmlkit/utils/log.py:7-72 — console + optional
midnight-rotating file handler, levels configurable via environment
variables, third-party logger suppression. Env var names use the FMKT_
prefix (FMKT_LOG_FILE_PATH, FMKT_FILE_LOGGER_LEVEL,
FMKT_CONSOLE_LOGGER_LEVEL).
"""
import logging
import logging.handlers
import os

_CONFIGURED = False

_FMT = "%(asctime)s | %(levelname)-8s | %(name)s | %(message)s"


def _level(name: str, default: str) -> int:
    return getattr(logging, os.environ.get(name, default).upper(), logging.INFO)


def _configure_root() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    root = logging.getLogger("finmlkit_tpu")
    root.setLevel(logging.DEBUG)

    console = logging.StreamHandler()
    console.setLevel(_level("FMKT_CONSOLE_LOGGER_LEVEL", "WARNING"))
    console.setFormatter(logging.Formatter(_FMT))
    root.addHandler(console)

    file_path = os.environ.get("FMKT_LOG_FILE_PATH", "")
    if file_path:
        os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
        fh = logging.handlers.TimedRotatingFileHandler(
            file_path, when="midnight", backupCount=7
        )
        fh.setLevel(_level("FMKT_FILE_LOGGER_LEVEL", "INFO"))
        fh.setFormatter(logging.Formatter(_FMT))
        root.addHandler(fh)

    # Quiet noisy third-party loggers (the reference suppresses these too).
    for noisy in ("jax", "urllib3", "matplotlib", "h5py"):
        logging.getLogger(noisy).setLevel(logging.WARNING)

    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    """Return a child logger under the package root, configuring on first use."""
    _configure_root()
    if not name.startswith("finmlkit_tpu"):
        name = f"finmlkit_tpu.{name}"
    return logging.getLogger(name)
