"""Training-data pipeline functions beyond the reference's operator set:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search, multimodal plumbing.

Cross-engine determinism convention: every hash the DuckDB oracles must
reproduce is md5 over an explicit string (hashlib.md5 ↔ DuckDB md5());
a production deployment would swap in xxhash/murmur for speed without
changing any dataflow.
"""

from .textstats import (EN_STOP, TOKEN_RE, norm_words, tokens_of,
                        text_stats_batch, langid_batch, fingerprint_batch)
from .dedup import (shingles_of, minhash_sigs, band_keys, simhash60,
                    exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs,
                    simhash_signatures, embedding_dup_pairs)
from .similarity import brute_force_topk, lsh_topk
from .media import MediaDecodeStage, media_features, synth_media_batch
