"""Shared stage helpers."""


def pool(concurrency):
    """Normalize an actor-pool concurrency spec to an autoscaling range.

    A fixed-size pool of N actors RESERVES N CPUs for the whole stage; if
    that equals the cluster's CPU count the upstream read starves and the
    pipeline deadlocks (observed on both the 4-cpu test session and the
    32-cpu bench). An autoscaling (1, N) pool starts at one actor and
    grows only while CPUs are actually available.
    """
    if isinstance(concurrency, int):
        return (1, max(1, concurrency))
    return concurrency
