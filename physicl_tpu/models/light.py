"""Alias module: physicl_tpu.models.light is physicl_tpu.light."""
from physicl_tpu.light import *  # noqa: F401,F403
