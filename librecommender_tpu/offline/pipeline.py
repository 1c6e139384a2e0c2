"""Offline feature-engineering pipeline (the Spark ML tier, redesigned).

The reference ships an offline big-data pipeline on a Spark cluster
(distributed/spark/src/main/scala/com/libreco/feature/FeatureEngineering.scala:9,
MultiHotEncoder.scala:18). Its role — scale-out offline feature
computation feeding batch models — maps TPU-natively onto vectorized
columnar transforms on the host (numpy, chunkable for out-of-core
frames) with the one *learned* stage (word vectors) trained as a jitted
SGNS loop on device, replacing Spark's Word2Vec.

Stages follow the Spark ``fit``/``transform`` estimator contract so the
Scala pipeline translates 1:1:

=====================  =============================================
Spark stage            This module
=====================  =============================================
VectorAssembler +      ``StandardScaler(cols)``
StandardScaler
StringIndexer +        ``StringIndexer(col)`` + ``OneHotEncoder(col)``
OneHotEncoderEstimator (``handle_invalid="keep"`` OOV slot semantics)
MultiHotEncoder        ``MultiHotEncoder(col, sep="|")``
RegexTokenizer         ``Tokenizer(col, pattern=r"\\w+")``
Word2Vec               ``WordVectors(col, vector_size=20)`` (SGNS on
                       device; transform = mean of word vectors, the
                       Spark Word2Vec document representation)
VectorAssembler        ``FeatureAssembler(inputs)``
=====================  =============================================

Transforms carry a plain ``dict`` of name -> (N, d) float arrays next to
the DataFrame (Spark's vector columns); ``Pipeline.transform`` returns
the assembled ``(N, F)`` feature matrix ready for the offline models.
"""
import re

import numpy as np


class Stage:
    """fit(df, cols) -> self; transform(df, cols) -> updates ``cols`` in
    place. ``cols`` holds upstream stages' vector outputs (Spark's vector
    columns), already populated for this stage at fit time."""

    def fit(self, df, cols=None):
        return self

    def transform(self, df, cols):
        raise NotImplementedError


class StandardScaler(Stage):
    """Scale continuous columns to zero mean / unit std
    (FeatureEngineering.scala:14-21: withMean(true), withStd(true))."""

    def __init__(self, input_cols, output_col="scaled_continuous_features"):
        self.input_cols = list(input_cols)
        self.output_col = output_col

    def fit(self, df, cols=None):
        x = df[self.input_cols].to_numpy(np.float64)
        self.mean_ = x.mean(axis=0)
        # ddof=1 matches Spark's sample std; NaN (single-row fit) and
        # zero-variance columns pass through unscaled
        self.std_ = x.std(axis=0, ddof=1)
        self.std_[~np.isfinite(self.std_) | (self.std_ == 0)] = 1.0
        return self

    def transform(self, df, cols):
        x = df[self.input_cols].to_numpy(np.float64)
        cols[self.output_col] = ((x - self.mean_) / self.std_).astype(
            np.float32
        )


class StringIndexer(Stage):
    """Ordinal-encode a categorical column; unseen values map to one OOV
    index (Spark handleInvalid="keep", FeatureEngineering.scala:30)."""

    def __init__(self, input_col, output_col=None):
        self.input_col = input_col
        self.output_col = output_col or f"{input_col}_index"

    def fit(self, df, cols=None):
        # Spark orders labels by descending frequency
        vals = df[self.input_col].astype(str)
        order = vals.value_counts(sort=True).index.to_numpy()
        self.labels_ = {v: i for i, v in enumerate(order)}
        return self

    def transform(self, df, cols):
        oov = len(self.labels_)
        idx = np.fromiter(
            (self.labels_.get(v, oov) for v in df[self.input_col].astype(str)),
            np.int64,
            len(df),
        )
        cols[self.output_col] = idx


class OneHotEncoder(Stage):
    """Indexed column -> one-hot block with a trailing OOV slot
    (FeatureEngineering.scala:35-38, handleInvalid="keep")."""

    def __init__(self, input_col, output_col=None):
        self.input_col = input_col
        self.output_col = output_col or (
            input_col[: -len("_index")] + "_vector"
            if input_col.endswith("_index")
            else f"{input_col}_vector"
        )

    def fit(self, df, cols=None):
        # width fixed at fit: train label count + one OOV slot, so train
        # and test transforms always assemble the same feature width
        idx = (cols or {}).get(self.input_col)
        if idx is None:
            raise ValueError(
                f"OneHotEncoder needs '{self.input_col}' produced by an "
                f"upstream StringIndexer in the same Pipeline fit"
            )
        self.width_ = (int(idx.max(initial=0)) + 2) if len(idx) else 1
        return self

    def transform(self, df, cols):
        idx = cols[self.input_col]
        out = np.zeros((len(idx), self.width_), np.float32)
        out[np.arange(len(idx)), np.minimum(idx, self.width_ - 1)] = 1.0
        cols[self.output_col] = out


class MultiHotEncoder(Stage):
    """Delimiter-separated tag column -> binary indicator matrix, one
    column per distinct tag seen at fit (MultiHotEncoder.scala:34:
    ``array_contains(split(trim(col)), tag)``)."""

    def __init__(self, input_col, sep="|", output_col=None):
        self.input_col = input_col
        self.sep = sep
        self.output_col = output_col or f"{input_col}_multihot"

    def fit(self, df, cols=None):
        tags = set()
        for v in df[self.input_col].astype(str):
            tags.update(t for t in v.strip().split(self.sep) if t)
        self.tags_ = sorted(tags)
        self._pos = {t: i for i, t in enumerate(self.tags_)}
        return self

    def transform(self, df, cols):
        out = np.zeros((len(df), len(self.tags_)), np.float32)
        for r, v in enumerate(df[self.input_col].astype(str)):
            for t in v.strip().split(self.sep):
                p = self._pos.get(t)
                if p is not None:
                    out[r, p] = 1.0
        cols[self.output_col] = out


class Tokenizer(Stage):
    """Regex tokenizer (FeatureEngineering.scala:43-48: pattern \\w+,
    gaps=false, lowercase)."""

    def __init__(self, input_col, output_col="words", pattern=r"\w+",
                 lowercase=True):
        self.input_col = input_col
        self.output_col = output_col
        self.pattern = re.compile(pattern)
        self.lowercase = lowercase

    def transform(self, df, cols):
        toks = []
        for v in df[self.input_col].astype(str):
            if self.lowercase:
                v = v.lower()
            toks.append(self.pattern.findall(v))
        cols[self.output_col] = toks


class WordVectors(Stage):
    """Token lists -> mean word vector per row: the Spark Word2Vec stage
    (FeatureEngineering.scala:49-55) with the gensim/Spark trainer
    replaced by a jitted skip-gram negative-sampling loop on device (the
    same SGNS core as bases/w2v_base.py; Spark's transform is the mean of
    a document's word vectors, which this reproduces)."""

    def __init__(self, input_col="words", output_col="word_vectors",
                 vector_size=20, window=3, min_count=0, epochs=5,
                 num_neg=5, learning_rate=0.025, batch_size=8192, seed=2020):
        self.input_col = input_col
        self.output_col = output_col
        self.vector_size = vector_size
        self.window = window
        self.min_count = min_count
        self.epochs = epochs
        self.num_neg = num_neg
        self.lr = learning_rate
        self.batch_size = batch_size
        self.seed = seed

    def fit(self, df, cols=None):
        # tokenize if the upstream Tokenizer hasn't populated cols yet
        # (fit runs before this stage's transform in Pipeline.fit)
        sents = (cols or {}).get(self.input_col)
        if sents is None:
            tmp = {}
            self._find_tokenizer().transform(df, tmp)
            sents = tmp[self.input_col]
        counts = {}
        for s in sents:
            for w in s:
                counts[w] = counts.get(w, 0) + 1
        vocab = [w for w, c in counts.items() if c >= self.min_count]
        self.vocab_ = {w: i for i, w in enumerate(sorted(vocab))}
        self.vectors_ = _train_sgns(
            [np.asarray([self.vocab_[w] for w in s if w in self.vocab_],
                        np.int32) for s in sents],
            n_vocab=len(self.vocab_),
            dim=self.vector_size,
            window=self.window,
            epochs=self.epochs,
            num_neg=self.num_neg,
            lr=self.lr,
            batch_size=self.batch_size,
            seed=self.seed,
            counts=np.asarray(
                [counts[w] for w in sorted(vocab)], np.float64
            ) if vocab else np.ones(0),
        )
        return self

    def _find_tokenizer(self):
        tok = getattr(self, "_tokenizer", None)
        if tok is None:
            raise ValueError(
                f"WordVectors found no '{self.input_col}' token column: "
                f"add an upstream Tokenizer stage, or call "
                f"set_source_column(<text column>) for standalone use"
            )
        return tok

    def set_source_column(self, col):
        self._tokenizer = Tokenizer(col, output_col=self.input_col)

    def transform(self, df, cols):
        sents = cols.get(self.input_col)
        if sents is None:
            self._find_tokenizer().transform(df, cols)
            sents = cols[self.input_col]
        out = np.zeros((len(sents), self.vector_size), np.float32)
        for r, s in enumerate(sents):
            ids = [self.vocab_[w] for w in s if w in self.vocab_]
            if ids:
                out[r] = self.vectors_[ids].mean(axis=0)
        cols[self.output_col] = out


class FeatureAssembler(Stage):
    """Concatenate vector columns into one (N, F) matrix
    (FeatureEngineering.scala:58-64 VectorAssembler)."""

    def __init__(self, input_cols, output_col="featureVector"):
        self.input_cols = list(input_cols)
        self.output_col = output_col

    def transform(self, df, cols):
        parts = []
        for name in self.input_cols:
            v = cols[name]
            v = np.asarray(v, np.float32)
            parts.append(v[:, None] if v.ndim == 1 else v)
        cols[self.output_col] = (
            np.concatenate(parts, axis=1) if parts
            else np.zeros((len(df), 0), np.float32)
        )


class Pipeline:
    """Minimal Spark-ML-style pipeline: ``fit`` runs each stage's fit then
    transform in order (estimator chaining); ``transform`` replays the
    fitted transforms. ``transform_chunks`` streams an iterator of frames
    for out-of-core batch jobs — the role Spark's executors play, served
    here by chunked host IO in front of the device."""

    def __init__(self, stages):
        self.stages = list(stages)

    def fit(self, df):
        self.fit_transform(df)
        return self

    def transform(self, df, output_col="featureVector"):
        cols = {}
        for s in self.stages:
            s.transform(df, cols)
        return cols[output_col] if output_col in cols else cols

    def fit_transform(self, df, output_col="featureVector"):
        # single pass: Pipeline.fit already runs each stage's transform
        # to chain estimators, so reuse those outputs instead of a
        # second full transform over the frame
        cols = {}
        for s in self.stages:
            s.fit(df, cols)
            s.transform(df, cols)
        return cols[output_col] if output_col in cols else cols

    def transform_chunks(self, frames, output_col="featureVector"):
        for frame in frames:
            yield frame, self.transform(frame, output_col)


def preprocess_pipeline(continuous=("age",), categorical=("sex", "occupation"),
                        multi_value="genre", text="movie"):
    """The reference's full preProcessPipeline
    (FeatureEngineering.scala:9-78): scaled continuous + one-hot
    categorical + multi-hot tags + word vectors, assembled."""
    stages = [StandardScaler(list(continuous))]
    assembled = []
    for c in categorical:
        stages.append(StringIndexer(c))
        stages.append(OneHotEncoder(f"{c}_index"))
        assembled.append(f"{c}_vector")
    if multi_value is not None:
        stages.append(MultiHotEncoder(multi_value))
        assembled.append(f"{multi_value}_multihot")
    if text is not None:
        stages.append(Tokenizer(text))
        stages.append(WordVectors("words"))
        assembled.append("word_vectors")
    assembled.append("scaled_continuous_features")
    stages.append(FeatureAssembler(assembled))
    return Pipeline(stages)


def _train_sgns(sentences, n_vocab, dim, window, epochs, num_neg, lr,
                batch_size, seed, counts):
    """Jitted SGNS over token sentences (the w2v_base.py trainer shape,
    specialized to a word vocabulary)."""
    if n_vocab == 0:
        return np.zeros((0, dim), np.float32)
    import jax
    import jax.numpy as jnp
    import optax

    from ..sampling.skipgram import skipgram_pairs

    rng = np.random.default_rng(seed)
    centers, contexts = skipgram_pairs(sentences, window, rng)
    if not len(centers):
        return np.zeros((n_vocab, dim), np.float32)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = {
        "w": jax.random.truncated_normal(k1, -2, 2, (n_vocab, dim)) * 0.05,
        "c": jax.random.truncated_normal(k2, -2, 2, (n_vocab, dim)) * 0.05,
    }
    probs = counts**0.75
    neg_cdf = jnp.asarray(np.cumsum(probs / probs.sum()), jnp.float32)
    optimizer = optax.adam(lr, eps=1e-8)
    opt_state = optimizer.init(params)

    def loss_fn(params, center, context, rng):
        B = center.shape[0]
        u = jax.random.uniform(rng, (B, num_neg))
        neg = jnp.searchsorted(neg_cdf, u).astype(jnp.int32)
        ce = params["w"][center]
        pe = params["c"][context]
        ne = params["c"][neg]
        pos_logit = jnp.sum(ce * pe, axis=1)
        neg_logit = jnp.einsum("bd,bsd->bs", ce, ne)
        return -jnp.mean(
            jax.nn.log_sigmoid(pos_logit)
            + jnp.sum(jax.nn.log_sigmoid(-neg_logit), axis=1)
        )

    @jax.jit
    def step(params, opt_state, center, context, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, center, context, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = min(batch_size, len(centers))
    step_idx = 0
    for _ in range(epochs):
        perm = rng.permutation(len(centers))
        for start in range(0, len(perm), bs):
            take = perm[start : start + bs]
            if len(take) < bs:
                take = np.pad(take, (0, bs - len(take)), mode="wrap")
            params, opt_state, _ = step(
                params, opt_state,
                jnp.asarray(centers[take]), jnp.asarray(contexts[take]),
                jax.random.fold_in(key, step_idx),
            )
            step_idx += 1
    return np.asarray(jax.device_get(params["w"]), np.float32)
