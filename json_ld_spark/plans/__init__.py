from json_ld_spark.plans.session import build_session  # noqa: F401
