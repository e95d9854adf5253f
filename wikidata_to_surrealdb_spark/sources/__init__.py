from wikidata_to_surrealdb_spark.sources.dump_reader import read_dump_lines
from wikidata_to_surrealdb_spark.sources.tables import TPCH_TABLES, load_sf_dir, register_views

__all__ = ["read_dump_lines", "TPCH_TABLES", "load_sf_dir", "register_views"]
