from clipself_tpu.utils.meters import AverageMeter, ThroughputMeter  # noqa: F401
