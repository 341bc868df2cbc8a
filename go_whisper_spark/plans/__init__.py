from go_whisper_spark.plans.audit import explain_formatted, assert_plan  # noqa: F401
