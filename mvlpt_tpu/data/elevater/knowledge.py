"""External-knowledge text augmentation for ELEVATER zero-shot /
feature extraction.

Behavioral port of the knowledge branch of
/root/reference/trainers/vision_benchmark/evaluation/feature.py:410-535:
per class, optional Wiktionary/WordNet definitions, WordNet hierarchy
paths (first 3 hops) and GPT-3 descriptions are appended to each prompt
template as `" ; {classname} , {knowledge}"`; per-class features are
the renormalized mean of the normalized per-text embeddings.

Data ships in knowledge.json (consolidated pure data; see its
_provenance field). Aggregation modes match the reference's
KNOWLEDGE.AGGREGATION.MEHTOD: WIKI_AND_GPT3 (concat) and WIKI_THEN_GPT3
(GPT-3 only as fallback).
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache

_KNOWLEDGE_PATH = os.path.join(os.path.dirname(__file__), "knowledge.json")


@lru_cache()
def load_knowledge() -> dict:
    with open(_KNOWLEDGE_PATH, encoding="utf-8") as f:
        return json.load(f)["tasks"]


def _clean(text: str) -> str:
    # The reference builds ' ' + ' '.join(word_tokenize(text))
    # (feature.py:509): whitespace-normalized, with a LEADING SPACE that
    # keeps the template's trailing '.' and the snippet's ';' as separate
    # BPE tokens ('.;' would merge under CLIP's punctuation grouping).
    # In-snippet word_tokenize punctuation splits (e.g. "dog's" ->
    # "dog 's") are not reproduced — whitespace normalization only.
    return " " + re.sub(r"\s+", " ", text).strip()


def knowledge_texts(task: str, classname: str, *,
                    use_wiki: bool = False, use_wordnet: bool = False,
                    use_hierarchy: bool = False, use_gpt3: bool = False,
                    n_gpt3: int = 5,
                    aggregation: str = "WIKI_AND_GPT3") -> list[str]:
    """Knowledge snippets for one class, formatted like feature.py:505-510.
    Empty list -> caller should use the plain templates."""
    table = load_knowledge().get(task, {})
    entry = table.get(classname, {})
    out: list[str] = []
    primary = None
    if use_wiki and entry.get("def_wiki"):
        primary = entry["def_wiki"]
    elif use_wordnet and entry.get("def_wn"):
        primary = entry["def_wn"]
    elif use_hierarchy and entry.get("path_wn"):
        path = entry["path_wn"]
        primary = " ".join(path[: min(3, len(path))]) if path else None
    if primary:
        out.append(primary)
    if use_gpt3 and entry.get("gpt3"):
        if aggregation == "WIKI_AND_GPT3" or not out:
            out.extend(entry["gpt3"][:n_gpt3])
    return [_clean(f" ; {classname} , {t}") for t in out if t]


def encode_class_text_features_with_knowledge(
        backbone, clip_cfg, task: str, classnames, templates,
        sources=("wiki",), n_gpt3: int = 5,
        aggregation: str = "WIKI_AND_GPT3", batch_rows: int = 512):
    """Knowledge-augmented normalized class text features (N, E)."""
    import jax
    import jax.numpy as jnp

    from mvlpt_tpu.core import clip as clip_core
    from mvlpt_tpu.tokenizer import tokenize

    import numpy as np

    use = {s: s in sources for s in ("wiki", "wordnet", "hierarchy", "gpt3")}
    # backbone as a jit ARGUMENT (closing over it would bake the text
    # tower into the program as constants — recompile per backbone and
    # an oversized compile payload on remote-compile transports)
    encode = jax.jit(lambda bb, ids: clip_core.encode_text(bb, ids, clip_cfg))

    # Gather every class's rows up front, then encode the flat matrix in
    # fixed-size chunks: classes have varying (templates x snippets) row
    # counts, and jitting per class would recompile the text tower for
    # every distinct count (and run unbounded batches for snippet-rich
    # classes — batch_rows caps the program size).
    all_texts: list[str] = []
    counts: list[int] = []
    for classname in classnames:
        ktexts = knowledge_texts(
            task, classname, use_wiki=use["wiki"], use_wordnet=use["wordnet"],
            use_hierarchy=use["hierarchy"], use_gpt3=use["gpt3"],
            n_gpt3=n_gpt3, aggregation=aggregation)
        if ktexts:
            texts = [t.format(classname) + k for k in ktexts for t in templates]
        else:
            texts = [t.format(classname) for t in templates]
        all_texts.extend(texts)
        counts.append(len(texts))

    ids = np.asarray(tokenize(all_texts, context_length=clip_cfg.context_length,
                              truncate=True))
    n_rows = len(ids)
    chunk = min(batch_rows, n_rows)
    embs = []
    for i in range(0, n_rows, chunk):
        part = ids[i:i + chunk]
        pad = chunk - len(part)
        if pad:  # pad the tail to the one compiled shape
            part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
        emb = encode(backbone, jnp.asarray(part)).astype(jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        embs.append(np.asarray(emb)[:chunk - pad])
    flat = np.concatenate(embs, axis=0)

    feats, start = [], 0
    for n in counts:
        mean = jnp.asarray(flat[start:start + n].mean(axis=0))
        feats.append(mean / jnp.linalg.norm(mean))
        start += n
    return jnp.stack(feats)
