from pixcrawler_spark.sources.tables import TableStore, load_table, TESTDATA_TABLES

__all__ = ["TableStore", "load_table", "TESTDATA_TABLES"]
