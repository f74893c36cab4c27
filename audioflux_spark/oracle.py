"""Pure-NumPy single-node BM25 oracle — the engine's cross-library comparator.

Plays the role librosa/torchaudio play for the reference (cross-library
numerical oracle, /root/reference/benchmark/README.md:4-17,152-166): an
independent, trivially-auditable implementation the distributed engine must
match *rank-identically* (FIXTURES.md F3).

Scoring: BM25 with Lucene-style idf,
    idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
    s(t, d) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
float64 throughout; total order (score desc, conv_id asc, turn_idx asc).
A query term absent from the corpus contributes 0; a document matches if it
contains at least one query term (disjunctive top-k, the reference query
semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from audioflux_spark.config import BM25Config, DEFAULT
from audioflux_spark.functions.analyzer import tokenize_series


def lucene_idf(N: int, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


class BM25Oracle:
    def __init__(self, transcripts: pd.DataFrame, cfg: BM25Config = DEFAULT.bm25):
        self.cfg = cfg
        docs = transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        self.conv_id = docs["conv_id"].to_numpy()
        self.turn_idx = docs["turn_idx"].to_numpy()
        toks = tokenize_series(docs["text"])
        self.doc_len = toks.str.len().to_numpy(dtype=np.float64)
        self.N = len(docs)
        self.avgdl = float(self.doc_len.mean()) if self.N else 0.0

        flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks]) if self.N else np.array([], dtype=object)
        flat_docs = np.repeat(np.arange(self.N), toks.str.len().to_numpy())
        tf_frame = (
            pd.DataFrame({"doc": flat_docs, "term": flat_terms})
            .groupby(["term", "doc"], sort=True)
            .size()
            .reset_index(name="tf")
        )
        # postings: term -> (doc_ix ascending, tf)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, grp in tf_frame.groupby("term", sort=False):
            self.postings[str(term)] = (
                grp["doc"].to_numpy(),
                grp["tf"].to_numpy(dtype=np.float64),
            )
        self.df = {t: len(p[0]) for t, p in self.postings.items()}

    def score_query(self, query_text: str) -> np.ndarray:
        """Dense float64 score vector over all docs (0 where no term hits)."""
        cfg = self.cfg
        scores = np.zeros(self.N, dtype=np.float64)
        terms = tokenize_series(pd.Series([query_text])).iloc[0]
        for term in dict.fromkeys(terms):  # dedup, keep order
            if term not in self.postings:
                continue
            doc_ix, tf = self.postings[term]
            idf = lucene_idf(self.N, self.df[term])
            dl = self.doc_len[doc_ix]
            denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / self.avgdl)
            scores[doc_ix] += idf * tf * (cfg.k1 + 1.0) / denom
        return scores

    def topk(self, query_text: str, k: int = 10) -> pd.DataFrame:
        scores = self.score_query(query_text)
        hit = np.flatnonzero(scores > 0.0)
        if hit.size == 0:
            return pd.DataFrame(
                {"conv_id": [], "turn_idx": [], "score": []}
            ).astype({"conv_id": str, "turn_idx": np.int32, "score": np.float64})
        # total order: score desc, then (conv_id, turn_idx) asc == doc_ix asc
        order = hit[np.lexsort((hit, -scores[hit]))][:k]
        return pd.DataFrame(
            {
                "conv_id": self.conv_id[order],
                "turn_idx": self.turn_idx[order].astype(np.int32),
                "score": scores[order],
            }
        )
