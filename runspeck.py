#!/usr/bin/env python
"""Thin launcher for the speck_tpu CLI (see speck_tpu/cli.py)."""

import sys

from speck_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv))
