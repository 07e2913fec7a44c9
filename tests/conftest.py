"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-device without a pod" — XLA's
host-platform device-count override gives 8 independent CPU devices so the
sharding/collective paths compile and execute exactly as they would on an
8-chip slice (SURVEY.md §4).
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.RandomState(0)
