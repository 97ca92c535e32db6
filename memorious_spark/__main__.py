"""``python -m memorious_spark`` / ``spark-submit --py-files
memorious_spark.zip -m``-style entry (see cli.py)."""

import sys

from memorious_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
