from gcm_tpu.oracle.oracle import oracle_stage, oracle_step, oracle_run  # noqa: F401
