"""``python -m desman_tpu`` == the ``desman`` console script (cli.main)."""
import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
