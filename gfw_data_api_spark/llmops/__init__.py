"""LLM-training-data pipeline operators (SURVEY.md §7.8).

Beyond the reference's own surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding near-dup), similarity search
(brute-force + hyperplane-LSH ANN), text analysis (language ID, quality
scoring, token counting, fingerprinting), and multimodal column plumbing.

Design rule: everything is built from native column expressions and
higher-order functions (whole-stage codegen, no Python in the hot path);
the only Python UDFs are the multimodal decode stubs where the media
libraries genuinely don't exist in this environment.
"""
