"""Bulk archive mirroring (aria2c wrapper + distributed fan-out).

Parity with the reference's downloader (reference ``aria2.py:13-109``):
resume, multi-connection segmented downloads, retries, optional checksum
integrity, basic auth, and skip-existing-non-empty semantics. The runner is
dependency-injected for tests, exactly like the reference's fake-runner
test seam (``tests/unit/ingestion/test_aria2.py``).

Scale path: :func:`mirror_urls` distributes a URL list across the cluster
with one task per partition (``foreachPartition``) so a 353-archive mirror
saturates many NICs; per-file skip-existing keeps it idempotent.
"""

from __future__ import annotations

import subprocess
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class Aria2Options:
    max_connections_per_server: int = 16
    split: int = 16
    min_split_size: str = "1M"
    max_tries: int = 5
    retry_wait: int = 2
    extra_args: list[str] = field(default_factory=list)


DEFAULT_OPTIONS = Aria2Options()

Runner = Callable[[list[str]], subprocess.CompletedProcess]


def _default_runner(argv: list[str]) -> subprocess.CompletedProcess:
    return subprocess.run(argv, check=False, capture_output=True, text=True)


def build_aria2_argv(
    url: str,
    output_path: Path,
    *,
    options: Aria2Options = DEFAULT_OPTIONS,
    checksum: tuple[str, str] | None = None,
    username: str | None = None,
    password: str | None = None,
) -> list[str]:
    argv = [
        "aria2c",
        "--continue=true",
        f"--max-connection-per-server={options.max_connections_per_server}",
        f"--split={options.split}",
        f"--min-split-size={options.min_split_size}",
        f"--max-tries={options.max_tries}",
        f"--retry-wait={options.retry_wait}",
        "--auto-file-renaming=false",
        "--allow-overwrite=true",
        f"--dir={output_path.parent}",
        f"--out={output_path.name}",
    ]
    if checksum is not None:
        alg, value = checksum
        argv += [f"--checksum={alg}={value}", "--check-integrity=true"]
    if username:
        argv.append(f"--http-user={username}")
    if password:
        argv.append(f"--http-passwd={password}")
    argv += options.extra_args
    argv.append(url)
    return argv


def download(
    url: str,
    output_path: str | Path,
    *,
    options: Aria2Options = DEFAULT_OPTIONS,
    checksum: tuple[str, str] | None = None,
    username: str | None = None,
    password: str | None = None,
    skip_existing: bool = True,
    runner: Runner = _default_runner,
) -> bool:
    """Mirror one URL. Returns True if a download ran, False if skipped.

    Skip-existing only applies when no checksum verification was requested
    (reference ``aria2.py:78-82``).
    """
    output_path = Path(output_path)
    if (
        skip_existing
        and checksum is None
        and output_path.exists()
        and output_path.stat().st_size > 0
    ):
        return False
    output_path.parent.mkdir(parents=True, exist_ok=True)
    argv = build_aria2_argv(
        url,
        output_path,
        options=options,
        checksum=checksum,
        username=username,
        password=password,
    )
    proc = runner(argv)
    if proc.returncode != 0:
        raise RuntimeError(
            f"aria2c failed ({proc.returncode}) for {url}: {proc.stderr or ''}"
        )
    return True


def mirror_urls(
    spark,
    entries: list[dict],
    dest_root: str,
    *,
    partitions: int | None = None,
    options: Aria2Options = DEFAULT_OPTIONS,
    runner: Runner = _default_runner,
) -> None:
    """Distribute a mirror job across the cluster.

    ``entries`` are manifest dicts (``url``, ``relative_path``, and
    optionally ``checksum`` = (alg, hex-digest) from a sidecar fetch — see
    ``runner._run_source_download``). Each task downloads its slice with
    integrity verification when a checksum is present; skip-existing makes
    re-runs no-ops.
    """
    n = partitions or max(1, min(len(entries), spark.sparkContext.defaultParallelism))
    dest = dest_root

    def work(it):
        for e in it:
            checksum = e.get("checksum")
            download(
                e["url"],
                Path(dest) / e["relative_path"],
                options=options,
                checksum=tuple(checksum) if checksum else None,
                runner=runner,
            )

    spark.sparkContext.parallelize(entries, n).foreachPartition(work)
