"""Run a python script under xitorch_tpu debug mode:

    python -m xitorch_tpu.debug script.py [args...]

Parity with /root/reference/xitorch/debug/__main__.py:14-32.
"""
import argparse
import runpy
import sys

from xitorch_tpu.debug.modes import set_debug_mode


def main():
    parser = argparse.ArgumentParser(
        description="Running python script in debug mode of xitorch_tpu")
    parser.add_argument("script", type=str, help="The python script to run")
    parser.add_argument("args", nargs=argparse.REMAINDER,
                        help="Arguments for the script")
    args = parser.parse_args()

    set_debug_mode(True)
    sys.argv = [args.script] + list(args.args)
    runpy.run_path(args.script, run_name="__main__")


if __name__ == "__main__":
    main()
