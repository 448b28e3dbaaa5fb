#!/usr/bin/env python3
"""Scale-trend corpora for the dedup family (VERDICT r7 #4).

Generates documents.parquet at 1x/2x/4x the sf0.1 row count with the
SAME generative process the driver's corpus exhibits (uniform words
from its 31-word vocabulary, 10..100 tokens/doc, 5 langs, 20 sources)
so wall-time scaling exponents are measured on a self-consistent
series — the baseline point is regenerated too, NOT the driver's file,
so all three points share one RNG/process.

Usage: python3 tools/gen_scale_docs.py [outRoot]   # default /tmp/graft_scale
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['the', 'query', 'row', 'stream', 'spark', 'fast', 'customer',
         'batch', 'data', 'sort', 'value', 'hash', 'filter', 'big', 'dup',
         'column', 'order', 'a', 'vector', 'part', 'scan', 'slow', 'agg',
         'key', 'window', 'table', 'merge', 'join', 'line', 'small', 'group']
LANGS = ['en', 'en', 'en', 'zh', 'es', 'de', 'fr']  # en-heavy like sf0.1
BASE_ROWS = 5000  # sf0.1's documents row count
BASE_VECS = 2000  # sf0.1's embeddings row count


def vocab_for(rows: int, heaps: bool):
    """Heaps-law mode (VERDICT r14 #7): the fixed 31-word vocabulary
    makes every vocabulary-sized structure (FuzzyVocabIndex _keys,
    q188/q192 probe frames, StreamingContainment state) look
    artificially FLAT across scales. With --heaps the vocabulary grows
    as V = 150 * m^0.5 (m = rows/BASE_ROWS — i.e. vocab ~ n^0.5, the
    classic Heaps exponent): the 31 base words plus synthetic >=5-char
    words ('word00017'), which participate in d<=2 deletion keygen, so
    the measured exponents of those rows become the honest ones."""
    if not heaps:
        return VOCAB
    target = max(len(VOCAB), int(150 * (rows / BASE_ROWS) ** 0.5))
    return VOCAB + [f'word{i:05d}' for i in range(target - len(VOCAB))]


def gen(out_dir: str, rows: int, seed: int, heaps: bool = False) -> None:
    vocab = vocab_for(rows, heaps)
    rnd = random.Random(seed)
    doc_id, text, lang, source, n_chars = [], [], [], [], []
    for i in range(rows):
        n = rnd.randint(10, 100)
        t = ' '.join(rnd.choice(vocab) for _ in range(n))
        doc_id.append(i)
        text.append(t)
        lang.append(rnd.choice(LANGS))
        source.append(f'src{rnd.randint(0, 19)}')
        n_chars.append(len(t))
    table = pa.table({'doc_id': pa.array(doc_id, pa.int64()),
                      'text': pa.array(text, pa.string()),
                      'lang': pa.array(lang, pa.string()),
                      'source': pa.array(source, pa.string()),
                      'n_chars': pa.array(n_chars, pa.int64())})
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, 'documents.parquet'))
    print(f'{out_dir}: {rows} docs')


def gen_emb(out_dir: str, rows: int, seed: int) -> None:
    """embeddings.parquet at the same multiplier: 10 label clusters with
    FIXED centers across scales (seeded separately) so the cell/cosine
    structure the ANN/semantic-dedup queries exploit is self-similar;
    every 50th vector is a near-duplicate of its predecessor so the
    SemDeDup population also scales with the corpus."""
    crnd = random.Random(777)
    centers = [[crnd.gauss(0.0, 0.25) for _ in range(64)] for _ in range(10)]
    rnd = random.Random(seed)
    vec_id, emb, label = [], [], []
    prev = None
    for i in range(rows):
        lab = rnd.randint(0, 9)
        if i % 50 == 49 and prev is not None:
            v = [x + rnd.gauss(0.0, 0.005) for x in prev]
            lab = label[-1]
        else:
            v = [c + rnd.gauss(0.0, 0.08) for c in centers[lab]]
        prev = v
        vec_id.append(i)
        emb.append([float(x) for x in v])
        label.append(lab)
    table = pa.table({'vec_id': pa.array(vec_id, pa.int64()),
                      'embedding': pa.array(emb, pa.list_(pa.float32())),
                      'label': pa.array(label, pa.int32())})
    pq.write_table(table, os.path.join(out_dir, 'embeddings.parquet'))
    print(f'{out_dir}: {rows} vecs')


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if a != '--heaps']
    heaps = '--heaps' in sys.argv[1:]
    root = args[0] if args else (
        '/tmp/graft_scale_heaps' if heaps else '/tmp/graft_scale')
    for mult in (1, 2, 4):
        gen(os.path.join(root, f'x{mult}'), BASE_ROWS * mult, seed=1234,
            heaps=heaps)
        gen_emb(os.path.join(root, f'x{mult}'), BASE_VECS * mult, seed=4321)
