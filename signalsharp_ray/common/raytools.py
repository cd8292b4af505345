"""Small Ray helpers shared by stages."""

from __future__ import annotations


def pool_size(requested: int, num_cpus_per_actor: float = 1.0) -> tuple[int, int]:
    """Return an AUTOSCALING pool spec (1, n) clamped to the cluster size.

    Two failure modes this guards against (both observed): a fixed pool
    sized to every CPU starves task stages and deadlocks the streaming
    executor; and two fixed pools in one pipeline can jointly demand more
    CPUs than exist. An autoscaling (min=1, max=n) pool always makes
    progress with one actor and grows only while CPUs are free."""
    import ray

    requested = max(1, int(requested))
    cap = requested
    if ray.is_initialized():
        total = ray.cluster_resources().get("CPU")
        if total:
            cap = max(1, min(requested, int((total - 1) // max(num_cpus_per_actor, 0.001))))
    return (1, cap)
