"""Single-label evaluation CLI (parity with semantic_segmentation_test).

Usage: python -m rovinasemanticsegmentation_tpu.cli.test \
           --conf <config file> [--key value ...]
(/root/reference/src/test.cpp:35-231)
"""

import sys

from ..cli.evaluate import run_evaluation
from ..utils.config import load_config_from_argv


def main(argv=None) -> None:
    conf, _ = load_config_from_argv(sys.argv[1:] if argv is None else argv)
    run_evaluation(conf, multi=False)


if __name__ == "__main__":
    main()
