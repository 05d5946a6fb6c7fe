"""Thin spark-submit driver: ships with --py-files mob_spark.zip.

    spark-submit --py-files mob_spark.zip run_job.py fit-woe ...
"""
from monotonic_optimal_binning_spark.jobs import main

if __name__ == "__main__":
    main()
