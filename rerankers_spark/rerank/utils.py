"""Small reference-parity utilities (SURVEY.md §2A rows 8, 9, 32).

In the Spark engine these roles are mostly played by the platform
(Arrow batching replaces manual chunking; executor-side UDF init
replaces driver device probing), but the callable surface is kept for
users migrating code that imports them from the reference.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, TypeVar

T = TypeVar("T")


def vprint(txt: str, verbose: int) -> None:
    """Gated print (reference rerankers/utils.py:11-13)."""
    if verbose > 0:
        print(txt)


def get_chunks(iterable: Iterable[T], chunk_size: int) -> Iterator[List[T]]:
    """Fixed-size batching (reference rerankers/utils.py:194-200). The
    distributed analog is Arrow record batching
    (spark.sql.execution.arrow.maxRecordsPerBatch); this exists for
    driver-side compatibility."""
    chunk: List[T] = []
    for item in iterable:
        chunk.append(item)
        if len(chunk) == chunk_size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def get_device(device: str | None = None, no_mps: bool = False) -> str:
    """Device autodetect (reference rerankers/utils.py:19-37). Returns
    'cpu' when torch is absent (this sandbox); on executors the scorer
    UDF calls this once per worker."""
    if device:
        return device
    try:
        import torch

        if torch.cuda.is_available():
            return "cuda"
        if not no_mps and getattr(torch.backends, "mps", None) and \
                torch.backends.mps.is_available():
            return "mps"
    except ImportError:
        pass
    return "cpu"


def get_dtype(dtype=None, device: str = "cpu", verbose: int = 0):
    """Dtype selection (reference rerankers/utils.py:40-53): fp16 on
    accelerators, fp32 on cpu; returns strings when torch is absent."""
    if dtype is not None:
        return dtype
    try:
        import torch

        return torch.float16 if device in ("cuda", "mps") else torch.float32
    except ImportError:
        return "float16" if device in ("cuda", "mps") else "float32"
