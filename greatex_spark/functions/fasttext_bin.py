"""Minimal fastText ``.bin`` model reader/writer — a REAL file-format
loader for the language-ID model seam.

The ``fasttext`` wheel is not installable in this sandbox, so the
seam's default loader (:func:`langid._fasttext_loader`) cannot be
exercised end-to-end here.  This module closes that gap the same way
``functions/arpa.py`` does for KenLM: a pure-numpy reader of the
PUBLIC fastText model serialization (facebookresearch/fastText,
``src/fasttext.cc`` ``saveModel``/``loadModel``, ``src/args.cc``,
``src/dictionary.cc``, ``src/densematrix.cc`` — file-format version
12, magic ``793712314``), exposing the exact batch ``predict(texts,
k=1)`` contract the seam's UDF body calls on a real
``fasttext.load_model`` object.  A tiny supervised model written by
:func:`write_fasttext_bin` is byte-level loadable by the real
``fasttext`` package; conversely this reader loads any unquantized,
unpruned supervised ``.bin`` — including subword models like a real
``lid.176.bin``: character n-gram features (``minn..maxn``) are
hashed with fastText's signed-char FNV-1a into ``bucket`` input rows
exactly as ``dictionary.cc`` (``hash``/``computeSubwords``/
``initNgrams``) does, so in-vocabulary tokens contribute their word
row plus their n-gram rows and OOV tokens contribute n-gram rows
alone.  Word n-grams (``wordNgrams > 1``) remain out of scope and
raise rather than mis-score.

Scoring follows the supervised softmax path: the hidden vector is the
mean of the input-matrix rows of every token's ids (the trailing
``</s>`` fastText appends to every line included, when in vocabulary —
EOS never gets subwords), and label probabilities are
``softmax(output @ hidden)``.
"""

from __future__ import annotations

import struct

import numpy as np

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12
EOS = "</s>"

# args.cc enums (public): model_name {cbow=1, sg=2, sup=3},
# loss_name {hs=1, ns=2, softmax=3, ova=4}
MODEL_SUP = 3
LOSS_SOFTMAX = 3

_ARGS_INT_FIELDS = (
    "dim", "ws", "epoch", "minCount", "neg", "wordNgrams",
    "loss", "model", "bucket", "minn", "maxn", "lrUpdateRate",
)


def ft_hash(s: str) -> int:
    """fastText's dictionary hash (``dictionary.cc Dictionary::hash``):
    FNV-1a over the UTF-8 bytes, with each byte passed through an
    ``int8_t`` cast before widening — bytes ≥ 0x80 are SIGN-EXTENDED
    into the uint32 xor (a deliberate quirk of the original; a plain
    FNV-1a would bucket every non-ASCII n-gram differently)."""
    h = 2166136261
    for b in s.encode("utf-8"):
        h ^= b if b < 0x80 else (b - 256) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def compute_subwords(word: str, minn: int, maxn: int) -> list[str]:
    """Character n-grams of ``<word>`` (BOW/EOW added by the caller's
    convention here: this function adds them), lengths ``minn..maxn``,
    walking UTF-8 character boundaries byte-wise exactly like
    ``dictionary.cc Dictionary::computeSubwords`` — continuation bytes
    (``0b10xxxxxx``) never start an n-gram and always ride along with
    their character; single-character n-grams touching either boundary
    are skipped (the ``n == 1 && (i == 0 || j == size)`` rule)."""
    bw = ("<" + word + ">").encode("utf-8")
    size = len(bw)
    out: list[str] = []
    for i in range(size):
        if (bw[i] & 0xC0) == 0x80:
            continue
        j, n = i, 1
        ngram = bytearray()
        while j < size and n <= maxn:
            ngram.append(bw[j])
            j += 1
            while j < size and (bw[j] & 0xC0) == 0x80:
                ngram.append(bw[j])
                j += 1
            if n >= minn and not (n == 1 and (i == 0 or j == size)):
                out.append(ngram.decode("utf-8"))
            n += 1
    return out


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def unpack(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals

    def cstring(self) -> str:
        end = self.data.index(b"\x00", self.pos)
        s = self.data[self.pos:end].decode("utf-8")
        self.pos = end + 1
        return s

    def matrix(self) -> np.ndarray:
        m, n = self.unpack("qq")
        count = m * n
        arr = np.frombuffer(
            self.data, dtype="<f4", count=count, offset=self.pos
        ).reshape(m, n)
        self.pos += 4 * count
        return arr.astype(np.float64)


class FastTextBinModel:
    """Unquantized supervised fastText model with the python package's
    ``predict`` batch interface (``(labels, probs)`` lists for a list
    input) — the exact surface ``langid.make_langid_udf`` scores
    through, so the UDF body is identical for this and a real model."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            r = _Reader(f.read())
        magic, version = r.unpack("ii")
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"{path!r} is not a fastText model (bad magic {magic})")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText file version {version}")
        ints = r.unpack("i" * len(_ARGS_INT_FIELDS))
        self.args = dict(zip(_ARGS_INT_FIELDS, ints))
        (self.args["t"],) = r.unpack("d")
        if self.args["model"] != MODEL_SUP:
            raise ValueError("only supervised models are supported")
        # real fastText's version-11 compatibility rule (checkpoint in
        # FastText::checkModel): v11 supervised files carry stale maxn
        # bytes that the loader must force to 0, else a loadable model
        # is misrejected by the subword gate below
        if version == 11 and self.args["model"] == MODEL_SUP:
            self.args["maxn"] = 0
        if self.args["wordNgrams"] != 1:
            raise ValueError(
                "word-ngram features (wordNgrams>1) are out of scope "
                "for this minimal reader"
            )
        size, nwords, nlabels = r.unpack("iii")
        _ntokens, pruneidx_size = r.unpack("qq")
        if pruneidx_size > 0:
            raise ValueError(
                "pruned (quantize -qnorm) dictionaries are not supported"
            )
        self.nwords = nwords
        self.word_id: dict[str, int] = {}
        self.labels: list[str] = []
        for i in range(size):
            word = r.cstring()
            _count, etype = r.unpack("qb")
            if etype == 0:
                self.word_id[word] = i
            else:
                self.labels.append(word)
        if len(self.labels) != nlabels:
            raise ValueError("dictionary label count mismatch")
        for _ in range(max(pruneidx_size, 0)):
            r.unpack("ii")
        (quant_input,) = r.unpack("b")
        if quant_input:
            raise ValueError("quantized models are not supported")
        self.input = r.matrix()
        (qout,) = r.unpack("b")
        if qout:
            raise ValueError("quantized output matrices are not supported")
        self.output = r.matrix()

    def _token_ids(self, tok: str) -> list[int]:
        """Input-matrix row ids for one token, per ``dictionary.cc``:
        in-vocabulary → the word row plus (when subwords are enabled
        and the token is not EOS, ``initNgrams``) its character-n-gram
        bucket rows; OOV → bucket rows alone (``getSubwords``).  Bucket
        rows live at ``nwords + (hash % bucket)``."""
        minn, maxn, bucket = self.args["minn"], self.args["maxn"], self.args["bucket"]
        ids: list[int] = []
        if tok in self.word_id:
            ids.append(self.word_id[tok])
            if maxn == 0 or tok == EOS:
                return ids
        elif maxn == 0:
            return ids
        ids.extend(
            self.nwords + (ft_hash(g) % bucket)
            for g in compute_subwords(tok, minn, maxn)
        )
        return ids

    def _predict_one(self, text: str, k: int):
        # fastText's python binding appends '\n', so every line carries a
        # trailing EOS token; it scores like any in-vocabulary word
        ids = [i for tok in text.split() + [EOS] for i in self._token_ids(tok)]
        if not ids:
            return [], np.array([])  # the real binding's empty-line result
        hidden = self.input[ids].mean(axis=0)
        scores = self.output @ hidden
        scores -= scores.max()
        probs = np.exp(scores)
        probs /= probs.sum()
        top = np.argsort(-probs)[:k]
        return [self.labels[i] for i in top], probs[top]

    def predict(self, texts, k: int = 1):
        if isinstance(texts, str):
            labels, probs = self._predict_one(texts, k)
            return tuple(labels), probs
        pairs = [self._predict_one(t, k) for t in texts]
        return [p[0] for p in pairs], [p[1] for p in pairs]

    def get_dimension(self) -> int:
        return self.args["dim"]


def fasttext_bin_loader(path: str) -> FastTextBinModel:
    """Loader for ``make_langid_udf(model_path, loader=...)``."""
    return FastTextBinModel(path)


def write_fasttext_bin(
    path: str,
    words: dict[str, "list[float] | np.ndarray"],
    labels: dict[str, "list[float] | np.ndarray"],
    bucket_rows: "np.ndarray | None" = None,
    minn: int = 0,
    maxn: int = 0,
) -> str:
    """Serialize a tiny supervised model to a spec-conformant ``.bin``
    — the in-sandbox stand-in for ``fasttext supervised`` training, so
    tests can build a model from vectors and round-trip it through
    :class:`FastTextBinModel` (or the real ``fasttext`` package).

    ``words`` maps vocabulary words to input-matrix rows; ``labels``
    maps ``__label__xx`` names to output-matrix rows.  Dictionary
    order follows fastText's post-``threshold()`` layout: all words
    first (ids ``0..nwords-1``), then labels.  Passing ``bucket_rows``
    (a ``(bucket, dim)`` matrix) with ``minn``/``maxn`` emits a SUBWORD
    model: the rows are appended to the input matrix at ids ``nwords +
    hash%bucket``, exactly where ``lid.176.bin``-style models keep
    their character-n-gram vectors."""
    word_rows = [np.asarray(v, dtype=np.float32) for v in words.values()]
    label_rows = [np.asarray(v, dtype=np.float32) for v in labels.values()]
    dim = len(word_rows[0])
    bucket = 0 if bucket_rows is None else int(np.asarray(bucket_rows).shape[0])
    out = bytearray()
    out += struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION)
    args = dict.fromkeys(_ARGS_INT_FIELDS, 0)
    args.update(
        dim=dim, ws=5, epoch=5, minCount=1, neg=5, wordNgrams=1,
        loss=LOSS_SOFTMAX, model=MODEL_SUP, bucket=bucket, minn=minn,
        maxn=maxn, lrUpdateRate=100,
    )
    out += struct.pack("<" + "i" * len(_ARGS_INT_FIELDS),
                       *(args[f] for f in _ARGS_INT_FIELDS))
    out += struct.pack("<d", 1e-4)
    size = len(words) + len(labels)
    out += struct.pack("<iii", size, len(words), len(labels))
    out += struct.pack("<qq", 100 * size, 0)  # ntokens, pruneidx size
    for name, etype in [(w, 0) for w in words] + [(lb, 1) for lb in labels]:
        out += name.encode("utf-8") + b"\x00"
        out += struct.pack("<qb", 100, etype)
    out += struct.pack("<b", 0)  # quant_input = false
    input_rows = word_rows if bucket == 0 else (
        word_rows + [np.asarray(r, dtype=np.float32) for r in bucket_rows]
    )
    for rows in (input_rows, label_rows):
        mat = np.vstack(rows)
        out += struct.pack("<qq", mat.shape[0], mat.shape[1])
        out += mat.astype("<f4").tobytes()
        if rows is input_rows:
            out += struct.pack("<b", 0)  # qout = false
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path
