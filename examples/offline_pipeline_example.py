"""Offline batch tier example — the reference's Spark pipeline
(distributed/spark/.../example/{AlsExample,ClassifierExample,
RegressorExample}.scala) re-run TPU-natively.

Three workflows over one interactions frame:
1. batch recommender: implicit ALS (on-device batched Cholesky) +
   top-N for a user subset with item-name mapping;
2. classifier: feature pipeline (scaled continuous, one-hot
   categorical, multi-hot genres, SGNS word vectors) -> MLP on device
   (or host random forest with algo="rf");
3. regressor: same features -> histogram GBT (or closed-form "glr").
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import pandas as pd

from librecommender_tpu.offline import (
    Classifier,
    Recommender,
    Regressor,
    preprocess_pipeline,
)

DATA = pathlib.Path("/root/reference/tests/sample_data/sample_movielens_merged.csv")


def load_frame():
    df = pd.read_csv(DATA, header=0)
    # the merged sample carries three genre columns; join them into the
    # pipe-separated multi-value column the Spark pipeline expects, and
    # synthesize a title for the word-vector stage
    df["genre"] = (
        df[["genre1", "genre2", "genre3"]]
        .astype(str)
        .agg(lambda r: "|".join(v for v in r if v not in ("missing", "nan")),
             axis=1)
    )
    df["movie"] = "movie " + df["item"].astype(str)
    # the merged sample's label column IS the 1-5 rating
    df["rating"] = df["label"].astype(int)
    return df


def main():
    df = load_frame()
    print(f"{len(df)} interactions, {df.user.nunique()} users, "
          f"{df.item.nunique()} items")

    # ---- 1. batch recommender (AlsExample.scala)
    rec = Recommender(rank=32, max_iter=10).train(df)
    name_map = {int(i): f"movie {i}" for i in df["item"].unique()}
    top = rec.recommend_for_users(df.iloc[:500], num=10,
                                  item_name_map=name_map)
    print("\nbatch recommendations (head):")
    print(top.head(10).to_string(index=False))

    # ---- 2. classifier (ClassifierExample.scala); rating -> 3 classes
    pipe = preprocess_pipeline(continuous=("age",),
                               categorical=("sex", "occupation"),
                               multi_value="genre", text="movie")
    clf = Classifier(algo="mlp", feature_pipeline=pipe,
                     max_iter=300).train(df)
    scored = clf.transform(df.iloc[:5])
    print("\nclassifier predictions:")
    print(scored[["user", "item", "rating", "pred"]].to_string(index=False))

    # ---- 3. regressor (RegressorExample.scala)
    regr = Regressor(algo="gbdt", max_iter=20).train(df)
    scored = regr.transform(df.iloc[:5])
    print("\nregressor predictions:")
    print(scored[["user", "item", "rating", "pred"]].to_string(index=False))


if __name__ == "__main__":
    main()
