#!/usr/bin/env python3
"""Test runner shim (counterpart of the reference's tests/run_tests.py).

    python tests/run_tests.py              # run everything
    python tests/run_tests.py --generate   # (re)generate golden files
    python tests/run_tests.py -k golden    # pass-through pytest args
"""

import os
import sys

import pytest

if __name__ == "__main__":
    args = sys.argv[1:]
    if "--generate" in args:
        args.remove("--generate")
        os.environ["GENERATE_EXPECTED"] = "1"
        args = args or ["tests/test_golden.py"]
    sys.exit(pytest.main(args or ["tests/"]))
