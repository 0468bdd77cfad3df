from crawling_vectordb_llm_spark.functions import text, vector

__all__ = ["text", "vector"]
