"""Print a fully-resolved config (after ``_base_`` inheritance + CLI
overrides). Parity with the reference ``tools/print_config.py:1-26``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsnet_tpu.utils.config import Config, DictAction


def parse_args():
    parser = argparse.ArgumentParser(description="Print the whole config")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--options", nargs="+", action=DictAction,
                        help="override config keys, e.g. model.head.nv=36")
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.options is not None:
        cfg.merge_from_dict(args.options)
    print(f"Config:\n{cfg.pretty_text}")


if __name__ == "__main__":
    main()
