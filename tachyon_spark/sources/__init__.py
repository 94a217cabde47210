from tachyon_spark.sources.csv_io import export_csv, import_csv
from tachyon_spark.sources.stats import samples_file_stats

__all__ = ["import_csv", "export_csv", "samples_file_stats"]
