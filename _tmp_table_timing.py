import time, numpy as np, jax, jax.numpy as jnp
from compression_tpu.distributions.deep_factorized import DeepFactorized
from compression_tpu.distributions.uniform_noise import UniformNoiseAdapter, NoisyNormal
from compression_tpu.entropy_models import ContinuousBatchedEntropyModel, LocationScaleIndexedEntropyModel

t0=time.perf_counter()
prior = UniformNoiseAdapter(DeepFactorized.create(jax.random.PRNGKey(0), (128,)))
print("prior create (axon)", time.perf_counter()-t0, flush=True)

em = ContinuousBatchedEntropyModel(prior, coding_rank=3)
t0=time.perf_counter(); tables = em.build_tables(); print("side build total", time.perf_counter()-t0, tables.cdf.shape, flush=True)

t0=time.perf_counter()
main = LocationScaleIndexedEntropyModel(NoisyNormal, coding_rank=3)
tm = main._em.build_tables()
print("main scale-table build", time.perf_counter()-t0, tm.cdf.shape, flush=True)
