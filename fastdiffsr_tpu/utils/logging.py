"""Dual file/console loggers (reference core/logger.py:128-141): a 'base'
train logger and a 'val' logger, each writing ``{phase}.log`` under the run
dir, plus optional TensorBoard via tensorboardX."""

from __future__ import annotations

import logging
import os


def setup_logger(logger_name: str, root: str, phase: str,
                 level=logging.INFO, screen: bool = False) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    target = os.path.abspath(os.path.join(root, f"{phase}.log"))
    if any(isinstance(h, logging.FileHandler)
           and getattr(h, "baseFilename", None) == target
           for h in logger.handlers):
        return logger
    # a second run dir in the same process (val after train, notebooks,
    # tests) must not keep logging into the previous run's file
    for h in list(logger.handlers):
        logger.removeHandler(h)
        if isinstance(h, logging.FileHandler):
            h.close()
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S")
    os.makedirs(root, exist_ok=True)
    # divergence from the reference (core/logger.py:134 uses mode='w'):
    # resuming into an existing experiment dir must not clobber the
    # previous run's history — append, with a separator per run
    path = os.path.join(root, f"{phase}.log")
    existed = os.path.exists(path) and os.path.getsize(path) > 0
    fh = logging.FileHandler(path, mode="a")
    fh.setFormatter(formatter)
    if existed:
        fh.stream.write("\n# ---- new run ----\n")
    logger.setLevel(level)
    logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        logger.addHandler(sh)
    return logger


def get_logger(name: str = "base") -> logging.Logger:
    return logging.getLogger(name)


def make_tb_writer(log_dir: str):
    """TensorBoard writer or None when tensorboardX is unavailable."""
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir=log_dir)
    except Exception:
        return None
