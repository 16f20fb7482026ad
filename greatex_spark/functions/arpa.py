"""Minimal ARPA n-gram language-model loader (KenLM's interchange
format) — a REAL file-format loader for the perplexity model seam.

The ``kenlm`` binary package is not installable in this sandbox, so
the seam's default loader (:func:`perplexity._kenlm_loader`) cannot be
exercised end-to-end here.  This module closes that gap with a
pure-Python reader of the public ARPA text format (Jurafsky & Martin
ch. 3; the format KenLM itself trains to and reads): a tiny model
trained/written in-test loads through ``make_log_perplexity_udf(path,
loader=arpa_loader)`` and scores on executors exactly like a real
KenLM model would — same ``model.score(sentence, bos=True, eos=True)``
signature and log10 semantics, so the UDF body is identical for both.

Supports orders 1 and 2 with standard Katz-style backoff:

    P(w | h) = P_bigram(w | h)            if (h, w) listed
             = 10^backoff(h) * P_uni(w)   otherwise

OOV words map to ``<unk>`` (required in the file, as KenLM mandates).
"""

from __future__ import annotations


class ArpaModel:
    """Order-<=2 ARPA model with KenLM's ``score`` interface.

    ``score(sentence, bos=True, eos=True)`` returns total log10
    probability of the whitespace-tokenized sentence, conditioned on
    ``<s>`` and including ``</s>`` — the exact contract
    ``perplexity.make_log_perplexity_udf`` expects from ``kenlm.Model``.
    """

    def __init__(self, path: str):
        self.logp1: dict[str, float] = {}
        self.backoff: dict[str, float] = {}
        self.logp2: dict[tuple[str, str], float] = {}
        section = None
        with open(path, encoding="utf-8") as f:
            for raw in f:
                line = raw.strip()
                if not line or line == "\\data\\" or line.startswith("ngram "):
                    continue
                if line.startswith("\\") and line.endswith("-grams:"):
                    section = int(line[1])
                    continue
                if line == "\\end\\":
                    break
                # logp <tab-or-space> words... [<tab-or-space> backoff];
                # words never contain whitespace, so a flat split is safe
                parts = line.split()
                if section == 1:
                    lp, w = float(parts[0]), parts[1]
                    self.logp1[w] = lp
                    if len(parts) > 2:
                        self.backoff[w] = float(parts[2])
                elif section == 2:
                    self.logp2[(parts[1], parts[2])] = float(parts[0])
        if "<unk>" not in self.logp1:
            raise ValueError(f"ARPA file {path!r} lacks mandatory <unk>")

    def _known(self, w: str) -> str:
        return w if w in self.logp1 else "<unk>"

    def _cond(self, h: str, w: str) -> float:
        pair = (h, w)
        if pair in self.logp2:
            return self.logp2[pair]
        return self.backoff.get(h, 0.0) + self.logp1[w]

    def score(self, sentence: str, bos: bool = True, eos: bool = True) -> float:
        toks = [self._known(w) for w in sentence.split()]
        if eos:
            # route the sentinel through the OOV map too: an ARPA file
            # that lacks a </s> unigram must degrade to <unk>, not raise
            # an opaque KeyError mid-scoring on an executor
            toks = toks + [self._known("</s>")]
        hist = self._known("<s>") if bos else None
        total = 0.0
        for w in toks:
            total += self._cond(hist, w) if hist is not None else self.logp1[w]
            hist = w
        return total


def arpa_loader(path: str) -> ArpaModel:
    """Loader for ``make_log_perplexity_udf(model_path, loader=...)``."""
    return ArpaModel(path)


def write_arpa(
    path: str,
    unigrams: dict[str, float],
    bigrams: dict[tuple[str, str], float],
    backoffs: dict[str, float] | None = None,
) -> str:
    """Serialize (log10) n-gram tables to a spec-conformant ARPA file —
    the in-sandbox stand-in for ``lmplz`` so tests can train a tiny
    model from counts and round-trip it through :class:`ArpaModel`."""
    backoffs = backoffs or {}
    lines = ["\\data\\", f"ngram 1={len(unigrams)}", f"ngram 2={len(bigrams)}", ""]
    lines.append("\\1-grams:")
    for w in sorted(unigrams):
        if w in backoffs:
            lines.append(f"{unigrams[w]:.7f}\t{w}\t{backoffs[w]:.7f}")
        else:
            lines.append(f"{unigrams[w]:.7f}\t{w}")
    lines += ["", "\\2-grams:"]
    for (a, b) in sorted(bigrams):
        lines.append(f"{bigrams[(a, b)]:.7f}\t{a} {b}")
    lines += ["", "\\end\\", ""]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return path
