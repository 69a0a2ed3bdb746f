"""spdlog-equivalent logging (reference verbosity mapping src/dafs.cpp:1665-1677).

verbose 0 -> warn, 1 -> info, 2 -> debug; format mirrors spdlog's default
``[timestamp] [level] message`` closely enough for human diffing.
"""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger("dafs_tpu")


def set_verbosity(verbose: int) -> None:
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s"))
        logger.addHandler(h)
    if verbose <= 0:
        logger.setLevel(logging.WARNING)
    elif verbose == 1:
        logger.setLevel(logging.INFO)
    else:
        logger.setLevel(logging.DEBUG)
