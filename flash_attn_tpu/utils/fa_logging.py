"""Leveled dispatch logging (reference: flash_attn/cute/fa_logging.py:38-95,
`FA_LOG_LEVEL` env). Logs host-side dispatch decisions — which kernel
variant, block sizes, paging route — NOT device-side prints (Pallas has
pl.debug_print for that when debugging a kernel interactively).

Levels: 0/unset = silent, 1 = dispatch summaries, 2 = verbose (+ shapes).
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER = None


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        lg = logging.getLogger("flash_attn_tpu")
        level = int(os.environ.get("FA_LOG_LEVEL", "0") or "0")
        if level <= 0:
            lg.addHandler(logging.NullHandler())
            lg.setLevel(logging.CRITICAL)
        else:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter("[fa_tpu] %(message)s"))
            lg.addHandler(h)
            lg.setLevel(logging.INFO if level == 1 else logging.DEBUG)
        _LOGGER = lg
    return _LOGGER


def log_dispatch(kind: str, **kv):
    lg = get_logger()
    if lg.isEnabledFor(logging.INFO):
        lg.info("%s %s", kind, " ".join(f"{k}={v}" for k, v in kv.items()))
