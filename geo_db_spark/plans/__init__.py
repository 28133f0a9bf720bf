from geo_db_spark.plans.geo_post import post_process  # noqa: F401
