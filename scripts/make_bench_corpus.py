"""Generate the FIXTURES.md 'bench' corpus (50k docs, seed=42) in the
driver documents.parquet shape, for scaling runs. Deterministic; written
under /tmp so the read-only testdata tree is untouched."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rerankers_spark.corpus import synthetic_corpus_pdf  # noqa: E402


def main(n_docs: int = 50_000, out_dir: str = "/tmp/sfbench") -> None:
    os.makedirs(out_dir, exist_ok=True)
    out = f"{out_dir}/documents.parquet"
    if os.path.exists(out):
        print(f"exists: {out}")
        return
    pdf = synthetic_corpus_pdf(n_docs)
    doc = pdf.reset_index().rename(columns={"index": "doc_id",
                                            "content": "text",
                                            "repo": "source"})
    doc["n_chars"] = doc["text"].str.len()
    # small row groups: a single-row-group file pins the Spark scan (and
    # the repartition shuffle-write feeding every build stage) to ONE
    # task — a hard serial stage that dominated the N-vs-4N scaling
    # measurement. 12.5k rows ≈ 25 MB per group → 64 splits at 800k docs.
    doc[["doc_id", "text", "lang", "source", "n_chars"]].to_parquet(
        out, row_group_size=12_500)
    print(f"wrote {len(doc)} docs to {out}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbench"
    main(n, out)
