"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-device without a pod" — XLA's
host-platform device-count override gives 8 independent CPU devices so the
sharding/collective paths compile and execute exactly as they would on an
8-chip slice (SURVEY.md §4).
"""
import os

# The environment presets JAX_PLATFORMS=axon and registers the TPU plugin
# via sitecustomize before this file runs, so plain env vars are not enough:
# force the platform through jax.config as well.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest

assert jax.default_backend() == 'cpu', jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'slow: multi-minute tests (model parity, train steps, multihost, '
        'deploy). Quick tier: pytest -m "not slow" (<3 min on the CPU mesh).')


@pytest.fixture(scope='session')
def rng():
    return np.random.RandomState(0)
