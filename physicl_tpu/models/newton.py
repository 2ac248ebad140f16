"""Alias module: physicl_tpu.models.newton is physicl_tpu.newton."""
from physicl_tpu.newton import *  # noqa: F401,F403
from physicl_tpu.newton import NewtonianKinematicsStep  # noqa: F401
