from rrs_tpu.utils.logging import get_logger, log_set, set_level  # noqa: F401
