from dampr_spark.plans.catalog import CatalogQuery, all_queries, get_query, oracle_map, query_map

__all__ = ["CatalogQuery", "all_queries", "get_query", "oracle_map", "query_map"]
