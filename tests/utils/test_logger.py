"""Logger subsystem tests.

Mirrors the reference's tests/utils/test_logger.py coverage: console
defaults, env-driven file logging with directory creation, idempotent
handler setup, and third-party logger suppression
(/root/reference/finmlkit/utils/log.py:7-72; ours is
finmlkit_tpu/utils/log.py with the FMKT_ env prefix).
"""
import importlib
import logging
import os

import pytest

import finmlkit_tpu.utils.log as logmod


@pytest.fixture
def fresh_logmod(monkeypatch, tmp_path):
    """Reload the log module with a clean root logger and env."""
    for var in ("FMKT_LOG_FILE_PATH", "FMKT_FILE_LOGGER_LEVEL",
                "FMKT_CONSOLE_LOGGER_LEVEL"):
        monkeypatch.delenv(var, raising=False)
    root = logging.getLogger("finmlkit_tpu")
    old_handlers = root.handlers[:]
    root.handlers.clear()
    mod = importlib.reload(logmod)
    yield mod
    # restore prior handler state for other tests
    logging.getLogger("finmlkit_tpu").handlers[:] = old_handlers
    importlib.reload(logmod)


class TestConsoleDefaults:
    def test_console_handler_created_at_warning(self, fresh_logmod):
        lg = fresh_logmod.get_logger("unit_test")
        root = logging.getLogger("finmlkit_tpu")
        consoles = [h for h in root.handlers
                    if isinstance(h, logging.StreamHandler)
                    and not isinstance(h, logging.FileHandler)]
        assert len(consoles) == 1
        assert consoles[0].level == logging.WARNING
        assert lg.name == "finmlkit_tpu.unit_test"

    def test_console_level_env_override(self, fresh_logmod, monkeypatch):
        monkeypatch.setenv("FMKT_CONSOLE_LOGGER_LEVEL", "DEBUG")
        mod = importlib.reload(logmod)
        mod.get_logger("x")
        root = logging.getLogger("finmlkit_tpu")
        consoles = [h for h in root.handlers
                    if isinstance(h, logging.StreamHandler)
                    and not isinstance(h, logging.FileHandler)]
        assert consoles[0].level == logging.DEBUG

    def test_no_file_handler_without_env(self, fresh_logmod):
        fresh_logmod.get_logger("y")
        root = logging.getLogger("finmlkit_tpu")
        assert not [h for h in root.handlers
                    if isinstance(h, logging.FileHandler)]

    def test_package_prefix_applied(self, fresh_logmod):
        assert fresh_logmod.get_logger("sub.module").name == \
            "finmlkit_tpu.sub.module"
        assert fresh_logmod.get_logger("finmlkit_tpu.bar").name == \
            "finmlkit_tpu.bar"


class TestFileLogging:
    def test_file_created_with_parent_dirs(self, fresh_logmod, monkeypatch,
                                           tmp_path):
        log_file = tmp_path / "nested" / "dir" / "fmkt.log"
        monkeypatch.setenv("FMKT_LOG_FILE_PATH", str(log_file))
        monkeypatch.setenv("FMKT_FILE_LOGGER_LEVEL", "INFO")
        mod = importlib.reload(logmod)
        lg = mod.get_logger("filetest")
        lg.info("hello file")
        for h in logging.getLogger("finmlkit_tpu").handlers:
            h.flush()
        assert log_file.exists()
        assert "hello file" in log_file.read_text()

    def test_file_level_respected(self, fresh_logmod, monkeypatch, tmp_path):
        log_file = tmp_path / "warn.log"
        monkeypatch.setenv("FMKT_LOG_FILE_PATH", str(log_file))
        monkeypatch.setenv("FMKT_FILE_LOGGER_LEVEL", "WARNING")
        mod = importlib.reload(logmod)
        lg = mod.get_logger("leveltest")
        lg.info("too quiet")
        lg.warning("loud enough")
        for h in logging.getLogger("finmlkit_tpu").handlers:
            h.flush()
        text = log_file.read_text()
        assert "loud enough" in text
        assert "too quiet" not in text

    def test_rotating_handler_configured(self, fresh_logmod, monkeypatch,
                                         tmp_path):
        monkeypatch.setenv("FMKT_LOG_FILE_PATH", str(tmp_path / "r.log"))
        mod = importlib.reload(logmod)
        mod.get_logger("rot")
        fhs = [h for h in logging.getLogger("finmlkit_tpu").handlers
               if isinstance(h, logging.handlers.TimedRotatingFileHandler)]
        assert len(fhs) == 1
        assert fhs[0].backupCount == 7
        assert fhs[0].when.upper() == "MIDNIGHT"


class TestIdempotency:
    def test_no_duplicate_handlers(self, fresh_logmod):
        fresh_logmod.get_logger("a")
        n1 = len(logging.getLogger("finmlkit_tpu").handlers)
        fresh_logmod.get_logger("b")
        fresh_logmod.get_logger("a")
        assert len(logging.getLogger("finmlkit_tpu").handlers) == n1

    def test_same_name_same_instance(self, fresh_logmod):
        assert fresh_logmod.get_logger("z") is fresh_logmod.get_logger("z")


class TestThirdPartySuppression:
    @pytest.mark.parametrize("name", ["urllib3", "matplotlib", "h5py"])
    def test_noisy_loggers_warning_or_higher(self, fresh_logmod, name):
        fresh_logmod.get_logger("trigger_config")
        assert logging.getLogger(name).level >= logging.WARNING

    def test_root_does_not_propagate(self, fresh_logmod):
        fresh_logmod.get_logger("p")
        assert logging.getLogger("finmlkit_tpu").propagate is False
