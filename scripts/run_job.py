"""spark-submit driver script (north_rule packaging surface).

    python scripts/build_pyfiles.py
    spark-submit --master local[8] --py-files dist/ocr_poc_spark.zip \
        scripts/run_job.py --input pages.parquet --out /tmp/out

On a cluster, replace --master and point --input at the Iceberg table
(iceberg:db.pages). The script only depends on the zip contents.
"""

import sys

from ocr_poc_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
