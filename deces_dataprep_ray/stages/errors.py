"""Error budget: bounded bad-row tolerance with a hard abort threshold.

The reference's watch loop tolerates up to ``ERR_MAX=20`` chunk-level errors
before aborting the whole run (`Makefile:19`, `Makefile:191-201` — the
``watch-run`` target counts ES chunk failures and kills the job past the
budget). The Ray-native re-owning: wrap any batch transform so that

- a failing batch is retried row-by-row, so one poison row costs one row,
  not 75,000 (the reference's chunk);
- every dropped row increments a shared budget actor (with an error sample);
- the first increment past ``max_errors`` raises, failing the pipeline fast
  instead of silently digesting a corrupt input at 100 TB.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import ray
import ray.data as rd


@ray.remote(num_cpus=0)
class ErrorBudget:
    """Shared error counter with a hard cap and bounded error samples."""

    def __init__(self, max_errors: int = 20, max_samples: int = 50):
        self.max_errors = int(max_errors)
        self.max_samples = int(max_samples)
        self.n = 0
        self.samples: list[str] = []

    def add(self, k: int, sample: str | None = None) -> tuple[int, int]:
        """Returns (total, cap) — the cap lives on the actor so every stage
        sharing this budget enforces the SAME limit."""
        self.n += int(k)
        if sample is not None and len(self.samples) < self.max_samples:
            self.samples.append(sample[:500])
        return self.n, self.max_errors

    def total(self) -> int:
        return self.n

    def errors(self) -> list[str]:
        return list(self.samples)


class ErrorBudgetExceeded(RuntimeError):
    pass


def with_error_budget(
    ds: rd.Dataset,
    fn: Callable[[pa.Table], pa.Table],
    budget,
    **map_batches_kwargs,
) -> rd.Dataset:
    """``ds.map_batches(fn)`` with a bad-row budget.

    ``budget`` is an :class:`ErrorBudget` actor handle (create once per run:
    ``ErrorBudget.remote(max_errors=20)``). A batch that raises is replayed
    row-by-row; failing rows are dropped and counted. Once the global count
    exceeds the ACTOR's cap — there is exactly one cap, the one the budget
    was constructed with, shared by every stage using it — the stage raises
    :class:`ErrorBudgetExceeded`, failing the run: the reference's ERR_MAX
    abort (`Makefile:19,199`), but row-granular and cluster-wide."""

    def guarded(batch: pa.Table) -> pa.Table:
        try:
            return fn(batch)
        except Exception:
            pass
        # poison batch: replay one row at a time, drop the bad ones
        good: list[pa.Table] = []
        bad = 0
        first_err: str | None = None
        for i in range(batch.num_rows):
            row = batch.slice(i, 1)
            try:
                good.append(fn(row))
            except Exception as e:  # noqa: BLE001 — budget accounting
                bad += 1
                if first_err is None:
                    first_err = f"{type(e).__name__}: {e}"
        total, cap = ray.get(budget.add.remote(bad, first_err))
        if total > cap:
            raise ErrorBudgetExceeded(
                f"error budget exceeded: {total} bad rows > {cap} "
                f"(first: {first_err})")
        if good:
            return pa.concat_tables(good)
        try:  # empty output with the transform's schema
            return fn(batch.slice(0, 0))
        except Exception:
            return batch.slice(0, 0)

    return ds.map_batches(guarded, batch_format="pyarrow",
                          **map_batches_kwargs)
