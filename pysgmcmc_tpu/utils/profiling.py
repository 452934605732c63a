"""Profiling and step-timing utilities.

The reference's only observability is wall-clock seconds in the BNN train
log (``/root/reference/pysgmcmc/models/bayesian_neural_network.py:409``).
Here:

- :func:`trace` wraps ``jax.profiler`` so a sampling run produces an XLA
  trace viewable in TensorBoard/Perfetto,
- :class:`StepTimer` measures steady-state steps/sec of any jitted step
  function (compile excluded, device-synchronized),
- :func:`log_progress` is the train-loop logging helper.
"""

import contextlib
import logging
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Profile a block: ``with trace("/tmp/tb"): run()``."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Measure steady-state throughput of a step function.

    >>> timer = StepTimer()
    >>> # timer.measure(lambda: step(state), n_warmup=1, n_repeats=3)
    """

    def measure(self, fn, n_warmup=1, n_repeats=3):
        """Return best wall-clock seconds over ``n_repeats`` synced calls."""
        for _ in range(n_warmup):
            jax.block_until_ready(fn())
        times = []
        for _ in range(n_repeats):
            start = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - start)
        return min(times)


def log_progress(iteration, cost, start_time, n_samples=None, every=512):
    """Train-loop logging in the reference's format
    (``bayesian_neural_network.py:470-508``)."""
    if iteration % every != 0:
        return
    elapsed = time.time() - start_time
    if n_samples is None:
        logging.info(
            "Iter %8d : NLL = %.4e Time = %5.2f", iteration, float(cost), elapsed
        )
    else:
        logging.info(
            "Iter %8d : NLL = %.4e Samples = %d Time = %5.2f",
            iteration, float(cost), n_samples, elapsed,
        )
