"""dpu_olap_tpu — a TPU-native vectorized query-execution framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of upmem/dpu_olap
(reference mounted at /root/reference): columnar SQL compute operators —
filter, take (gather), sum-aggregate, radix hash-partition, and partitioned
hash join (build + probe + take) — executed over HBM-resident Arrow-layout
columnar batches on TPU device meshes.

Architecture (TPU-first, not a port):
  - ``ops/``       device kernels: XLA/Pallas compute paths (the equivalent of
                   the reference's DPU C kernels, ``dpu/shared/kernels/*``).
  - ``parallel/``  device mesh runtime + distributed shuffle over ICI
                   (the equivalent of ``host/dpuext`` + ``host/partition``).
  - ``operators/`` operator drivers with the reference's uniform
                   Prepare()/Run()/Timers() protocol (``host/{filter,join,...}``).
  - ``native/``    C++ host runtime: parallel memcpy, partition slabs, timers,
                   ordered async executor (``host/memory_utils``, ``host/timer``).
  - ``columnar``   Arrow-layout Batch/Table over JAX arrays with pyarrow interop.
  - ``generator``  seeded data generation replicating host/generator semantics.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .columnar import Batch, Table  # noqa: F401


def __getattr__(name):
    # Lazy convenience exports (avoid importing jax-heavy modules eagerly).
    if name == "DeviceSet":
        from .parallel.mesh import DeviceSet

        return DeviceSet
    if name == "plan":
        import importlib

        return importlib.import_module(".plan", __name__)
    raise AttributeError(name)
