from clipself_tpu.eval.zero_shot import evaluate_zero_shot, macc_with_is_thing  # noqa: F401
