"""Utilities: KV logging, profiling, configuration."""

from humanliff_tpu.utils.logger import KVLogger, configure, logkv, logkv_mean, dumpkvs, profile_kv
from humanliff_tpu.utils.profiling import timed, Timer
