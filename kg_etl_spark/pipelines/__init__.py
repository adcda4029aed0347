from kg_etl_spark.pipelines.kg import run_kg_pipeline  # noqa: F401
