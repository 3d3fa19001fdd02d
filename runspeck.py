#!/usr/bin/env python
"""runspeck — benchmark CLI, the analogue of runspECK
(/root/reference/source/runspECK.cpp:13-32 + source/RunConfig.cpp:8-23).

Usage: python runspeck.py <matrix.mtx> [config.ini]

Config keys honored (the reference's 6 live keys, SURVEY.md §2 #4):
InputFile, IterationsWarmUp, IterationsExecution, TrackIndividualTimes,
TrackCompleteTimes, CompareResult.
"""

import sys

import numpy as np

from speck_tpu.executor import Executor
from speck_tpu.utils.config import Config


def main(argv):
    if len(argv) < 2:
        print(
            "Need matrix market file path (.mtx) as first argument\n"
            "Usage: python runspeck.py <matrix.mtx> [config.ini]",
            file=sys.stderr,
        )
        return 1
    config = Config.init(argv[2] if len(argv) > 2 else None)
    # InputFile in the config overrides the command line (RunConfig.cpp:22)
    path = config.get_string("InputFile", "") or argv[1]
    dtype = np.float32  # TPU-native default; use --fp64 for float64 values
    if "--fp64" in argv:
        dtype = np.float64
    executor = Executor(path, config=config, dtype=dtype)
    result = executor.run()
    return 0 if result.compared_ok in (None, True) else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv))
