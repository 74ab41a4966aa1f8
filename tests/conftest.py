import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import opm_tpu  # noqa: E402,F401  (enables x64)

# Tests run on CPU with a virtual 8-device mesh (the analogue of the
# reference's mpirun-on-one-box distributed tests, SURVEY.md §4). The bench
# and production paths run on the real TPU; set OPM_TPU_TEST_TPU=1 to run the
# test suite there instead. NOTE: this environment's sitecustomize force-sets
# jax_platforms="axon,cpu" (TPU tunnel first), so plain JAX_PLATFORMS=cpu is
# not enough — override the config explicitly before any backend init.
if os.environ.get("OPM_TPU_TEST_TPU", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
