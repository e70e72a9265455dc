"""Async job registry for long-running analyses (batch list queries).

Reference: POST /dataset/{d}/{v}/query/batch returns 202 + a job id
(app/routes/datasets/queries.py:300-427) that the user polls via
GET /job/{job_id} (app/routes/jobs/job.py:24-101) until ``data.status``
reaches success / partial_success / failed / error, then fetches results
from ``download_link`` and bad inputs from ``failed_geometries_link``.
There the execution engine is a Step Functions map over Lambdas; here
the engine IS the Spark cluster, so a job is a daemon thread submitting
one Spark job (raster/batch.py collapses the whole feature list into a
single plan — at 100 TB the per-feature fan-out is the anti-pattern,
one tile-pruned pass is the scale shape).

Results are written as JSON files under the registry's job directory;
the API exposes them at /job/{id}/download and
/job/{id}/failed_geometries. Reference jobs expire after 90 days —
local files persist until the directory is cleaned.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from dataclasses import asdict, dataclass
from typing import Any, Callable


@dataclass
class UserJob:
    """models/pydantic/user_job.py:9-16 shape."""

    job_id: str
    job_link: str | None = None
    status: str = "pending"  # pending | success | partial_success | failed | error
    message: str | None = None
    download_link: str | None = None
    failed_geometries_link: str | None = None
    progress: str | None = "0%"


class JobRegistry:
    """Thread-backed job store with on-disk results."""

    def __init__(self, directory: str):
        self._dir = directory
        self._jobs: dict[str, UserJob] = {}
        self._lock = threading.Lock()
        os.makedirs(directory, exist_ok=True)

    def get(self, job_id: str) -> UserJob | None:
        with self._lock:
            job = self._jobs.get(job_id)
            return UserJob(**asdict(job)) if job else None

    def result_path(self, job_id: str, kind: str) -> str:
        return os.path.join(self._dir, f"{job_id}.{kind}.json")

    def submit(
        self,
        runner: Callable[[], tuple[list[dict[str, Any]], list[int]]],
        synchronous: bool = False,
    ) -> UserJob:
        """Start ``runner`` (returns (per_feature_results, failed_ids)).

        ``synchronous=True`` runs inline — deterministic for tests, and
        the right mode for callers that want the reference's 5-minute
        cap behavior enforced by their own timeout.
        """
        job_id = str(uuid.uuid4())
        job = UserJob(job_id=job_id, job_link=f"/job/{job_id}")
        with self._lock:
            self._jobs[job_id] = job

        def run() -> None:
            try:
                results, failed = runner()
                with open(self.result_path(job_id, "results"), "w") as fh:
                    json.dump(results, fh, default=str)
                with open(self.result_path(job_id, "failed"), "w") as fh:
                    json.dump(failed, fh)
                if failed and not results:
                    status = "failed"
                elif failed:
                    status = "partial_success"
                else:
                    status = "success"
                with self._lock:
                    stored = self._jobs[job_id]
                    stored.status = status
                    stored.progress = "100%"
                    stored.download_link = (
                        f"/job/{job_id}/download" if results else None
                    )
                    stored.failed_geometries_link = (
                        f"/job/{job_id}/failed_geometries" if failed else None
                    )
            except Exception as exc:  # noqa: BLE001 — job error is a status
                with self._lock:
                    stored = self._jobs[job_id]
                    stored.status = "error"
                    stored.message = f"{type(exc).__name__}: {exc}"
                    stored.progress = "0%"

        if synchronous:
            run()
        else:
            threading.Thread(target=run, daemon=True).start()
        return UserJob(**asdict(self._jobs[job_id]))

    def read_result(self, job_id: str, kind: str) -> Any:
        path = self.result_path(job_id, kind)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)
