"""Histogram-based tree ensembles for the offline tier.

The reference's Spark pipeline trains RandomForestClassifier
(distributed/spark/.../model/Classifier.scala:46-56) and GBTRegressor
(model/Regressor.scala:28-38) on the assembled feature vector. Tree
ensembles don't map onto the MXU, so — like Spark, which runs them on
CPU executors — these run host-side, but redesigned around vectorized
histogram accumulation (the LightGBM-style formulation): features are
quantile-binned once up front, every node's split search is a single
``np.add.at`` scatter over (feature, bin) histograms, and a whole tree
level is grown per pass. No Python loop touches individual samples.

``RandomForest`` grows gini-split classification trees on bootstrap
samples with per-node feature subsampling; ``GradientBoostedTrees``
fits variance-split regression trees to residuals with shrinkage and
row subsampling (maxDepth=3, maxIter=20, stepSize=.01, subsample=.8
defaults match Regressor.scala:31-36).
"""
import numpy as np

_MAX_BINS = 32


def _quantile_bins(X, n_bins=_MAX_BINS):
    """Per-feature quantile bin edges -> (binned uint8 matrix, edges)."""
    N, F = X.shape
    edges = []
    binned = np.empty((N, F), np.uint8)
    qs = np.linspace(0, 1, n_bins + 1)[1:-1]
    for f in range(F):
        e = np.unique(np.quantile(X[:, f], qs))
        edges.append(e)
        binned[:, f] = np.searchsorted(e, X[:, f], side="right")
    return binned, edges


def _apply_bins(X, edges):
    N, F = X.shape
    binned = np.empty((N, F), np.uint8)
    for f in range(F):
        binned[:, f] = np.searchsorted(edges[f], X[:, f], side="right")
    return binned


class _Tree:
    """Level-wise grown tree on binned features. Arrays indexed by node:
    feature, bin threshold, children, and leaf value (scalar for
    regression, class distribution for classification)."""

    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self):
        self.feature = []
        self.threshold = []
        self.left = []
        self.right = []
        self.value = []

    def _new_node(self, value):
        self.feature.append(-1)
        self.threshold.append(0)
        self.left.append(-1)
        self.right.append(-1)
        self.value.append(value)
        return len(self.feature) - 1

    def predict(self, binned):
        node = np.zeros(len(binned), np.int64)
        feature = np.asarray(self.feature)
        threshold = np.asarray(self.threshold)
        left = np.asarray(self.left)
        right = np.asarray(self.right)
        while True:
            f = feature[node]
            rows = np.nonzero(f >= 0)[0]
            if not len(rows):
                break
            n_rows = node[rows]
            go_left = binned[rows, f[rows]] <= threshold[n_rows]
            node[rows] = np.where(go_left, left[n_rows], right[n_rows])
        vals = np.asarray(self.value)
        return vals[node]


def _grow_tree(binned, grad, max_depth, min_samples,
               feature_frac, rng, leaf_value):
    """Shared level-wise grower.

    ``grad``: (N,) regression target (residuals) or (N, K) one-hot class
    indicators. Split criterion: sum-of-squares gain for the first,
    gini-style purity gain for the second — both reduce to the same
    histogram algebra on sum/count accumulators.
    ``leaf_value(sums, count)`` maps accumulated stats to a leaf value.
    """
    N, F = binned.shape
    multi = grad.ndim == 2
    tree = _Tree()
    stats_dim = grad.shape[1] if multi else 1
    g2 = grad if multi else grad[:, None]

    root_sum = g2.sum(axis=0)
    root = tree._new_node(leaf_value(root_sum, N))
    frontier = [(root, np.arange(N))]

    for _ in range(max_depth):
        next_frontier = []
        for node, rows in frontier:
            n = len(rows)
            if n < min_samples:
                continue
            feats = np.arange(F)
            if feature_frac < 1.0:
                k = max(1, int(F * feature_frac))
                feats = rng.choice(F, size=k, replace=False)
            b = binned[rows][:, feats]                       # (n, f)
            g = g2[rows]                                     # (n, K)
            f_count = len(feats)
            # histogram accumulate: one scatter per (sum, count)
            hist_sum = np.zeros((f_count * _MAX_BINS, stats_dim))
            hist_cnt = np.zeros(f_count * _MAX_BINS)
            flat = (np.arange(f_count) * _MAX_BINS)[None, :] + b  # (n, f)
            gb = np.broadcast_to(
                g[:, None, :], (n, f_count, stats_dim)
            ).reshape(-1, stats_dim)
            np.add.at(hist_sum, flat.ravel(), gb)
            np.add.at(hist_cnt, flat.ravel(), 1.0)
            hist_sum = hist_sum.reshape(f_count, _MAX_BINS, stats_dim)
            hist_cnt = hist_cnt.reshape(f_count, _MAX_BINS)
            left_sum = np.cumsum(hist_sum, axis=1)           # (f, B, K)
            left_cnt = np.cumsum(hist_cnt, axis=1)           # (f, B)
            node_sum = g.sum(axis=0)                         # (K,)
            right_sum = node_sum[None, None, :] - left_sum
            right_cnt = float(n) - left_cnt
            with np.errstate(divide="ignore", invalid="ignore"):
                # proxy gain: ||S_l||^2/n_l + ||S_r||^2/n_r (variance
                # reduction for regression; equivalent ordering to gini
                # gain for one-hot class sums)
                gain = (
                    np.where(left_cnt > 0,
                             (left_sum**2).sum(-1) / left_cnt, 0.0)
                    + np.where(right_cnt > 0,
                               (right_sum**2).sum(-1) / right_cnt, 0.0)
                )
            gain[:, -1] = -np.inf                            # no empty right
            valid = (left_cnt >= 1) & (right_cnt >= 1)
            gain = np.where(valid, gain, -np.inf)
            best = np.unravel_index(np.argmax(gain), gain.shape)
            base = (node_sum**2).sum() / float(n)
            if not np.isfinite(gain[best]) or gain[best] <= base + 1e-12:
                continue
            f_local, t = best
            f_global = int(feats[f_local])
            go_left = binned[rows, f_global] <= t
            lrows, rrows = rows[go_left], rows[~go_left]
            lv = leaf_value(g2[lrows].sum(axis=0), len(lrows))
            rv = leaf_value(g2[rrows].sum(axis=0), len(rrows))
            lnode, rnode = tree._new_node(lv), tree._new_node(rv)
            tree.feature[node] = f_global
            tree.threshold[node] = int(t)
            tree.left[node] = lnode
            tree.right[node] = rnode
            next_frontier.append((lnode, lrows))
            next_frontier.append((rnode, rrows))
        frontier = next_frontier
        if not frontier:
            break
    return tree


class RandomForest:
    """Bagged gini-split classifier (Classifier.scala:46-56 defaults:
    maxDepth=3, numTrees=100, subsamplingRate=1.0, featureSubset auto)."""

    def __init__(self, n_trees=100, max_depth=3, subsample=1.0,
                 feature_frac=None, min_samples=2, seed=42):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.subsample = subsample
        self.feature_frac = feature_frac
        self.min_samples = min_samples
        self.seed = seed

    def fit(self, X, y):
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.int64)
        self.n_classes_ = int(y.max()) + 1
        onehot = np.zeros((len(y), self.n_classes_))
        onehot[np.arange(len(y)), y] = 1.0
        binned, self.edges_ = _quantile_bins(X)
        rng = np.random.default_rng(self.seed)
        # Spark's "auto" for classification = sqrt(F)
        frac = self.feature_frac
        if frac is None:
            frac = max(1, int(np.sqrt(X.shape[1]))) / X.shape[1]

        def leaf(sums, count):
            return sums / max(count, 1)

        self.trees_ = []
        for _ in range(self.n_trees):
            take = rng.choice(len(y), size=int(len(y) * self.subsample),
                              replace=True)
            self.trees_.append(
                _grow_tree(binned[take], onehot[take], self.max_depth,
                           self.min_samples, frac, rng, leaf)
            )
        return self

    def predict_proba(self, X):
        binned = _apply_bins(np.asarray(X, np.float64), self.edges_)
        probs = np.zeros((len(binned), self.n_classes_))
        for t in self.trees_:
            probs += t.predict(binned)
        probs /= len(self.trees_)
        s = probs.sum(axis=1, keepdims=True)
        return probs / np.where(s > 0, s, 1.0)

    def predict(self, X):
        return self.predict_proba(X).argmax(axis=1)


class GradientBoostedTrees:
    """Squared-loss boosting with shrinkage + row subsampling
    (Regressor.scala:28-38 defaults: maxDepth=3, maxIter=20,
    stepSize=0.01, subsamplingRate=0.8)."""

    def __init__(self, n_iter=20, max_depth=3, learning_rate=0.01,
                 subsample=0.8, min_samples=2, seed=42):
        self.n_iter = n_iter
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.subsample = subsample
        self.min_samples = min_samples
        self.seed = seed

    def fit(self, X, y):
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        binned, self.edges_ = _quantile_bins(X)
        rng = np.random.default_rng(self.seed)
        self.base_ = float(y.mean())
        pred = np.full(len(y), self.base_)
        self.trees_ = []

        def leaf(sums, count):
            return float(sums[0]) / max(count, 1)

        for _ in range(self.n_iter):
            resid = y - pred
            take = rng.choice(len(y), size=int(len(y) * self.subsample),
                              replace=False)
            tree = _grow_tree(binned[take], resid[take],
                              self.max_depth, self.min_samples, 1.0, rng,
                              leaf)
            self.trees_.append(tree)
            pred += self.learning_rate * np.asarray(
                tree.predict(binned), np.float64
            ).reshape(-1)
        return self

    def predict(self, X):
        binned = _apply_bins(np.asarray(X, np.float64), self.edges_)
        pred = np.full(len(binned), self.base_)
        for t in self.trees_:
            pred += self.learning_rate * np.asarray(
                t.predict(binned), np.float64
            ).reshape(-1)
        return pred
