"""LDA topic filter at ingest (SURVEY.md P4).

The reference trains a gensim LDA and drops documents whose probability on
any banned topic exceeds a per-topic threshold (common_crawl_processor/
LDAmodel.py:16-25, filter_documents.py:46-98, thresholds from
topics_threshold.txt). Spark-native equivalent: spark.ml CountVectorizer →
LDA → topicDistribution vector → vector_to_array filter — all built-in
estimators, no UDFs in the scoring path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import LDA, LDAModel
from pyspark.ml.feature import CountVectorizer, CountVectorizerModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pears_fruit_fly_spark.operators.dedup import tokens_array


@dataclass
class TopicFilterModel:
    cv: CountVectorizerModel
    lda: LDAModel

    def topic_distribution(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        toks = df.withColumn("_toks", tokens_array(text_col))
        vecs = self.cv.transform(toks)
        out = self.lda.transform(vecs)
        return out.drop("_toks", "_tf")

    def filter_banned(
        self,
        df: DataFrame,
        banned: dict[int, float],
        text_col: str = "text",
    ) -> DataFrame:
        """Drop rows where any banned topic's probability exceeds its
        threshold (classify_removal semantics, LDAmodel.py:16-25)."""
        scored = self.topic_distribution(df, text_col)
        return scored.filter(keep_condition(banned)).drop("topicDistribution")


def keep_condition(banned: dict[int, float], dist_col: str = "topicDistribution"):
    """Column predicate implementing the reference's removal rule EXACTLY
    (LDAmodel.py:16-25 classify_removal): a doc is dropped (label=1) iff ANY
    banned topic's probability is STRICTLY greater than its threshold; kept
    otherwise (filter_documents.py:75-80 keeps label != 1). Separated from
    the model so the decision rule is contract-testable against hand-set
    topic matrices without training an LDA (VERDICT r1 #9)."""
    probs = vector_to_array(dist_col)
    keep = F.lit(True)
    for topic_id, thr in banned.items():
        keep = keep & (probs[int(topic_id)] <= F.lit(float(thr)))
    return keep


def train_topic_filter(
    df: DataFrame,
    text_col: str = "text",
    n_topics: int = 10,
    vocab_size: int = 5000,
    max_iter: int = 20,
    seed: int = 111,
) -> TopicFilterModel:
    """Train CountVectorizer + LDA (online EM, the distributed default).

    Reference hyperparameter shape: 100 topics, chunksize 2000, passes 20
    (train_lda.py:30-67); shrunk defaults here fit test corpora — production
    callers pass n_topics=100.
    """
    toks = df.withColumn("_toks", tokens_array(text_col))
    cv = CountVectorizer(
        inputCol="_toks", outputCol="_tf", vocabSize=vocab_size, minDF=1.0
    ).fit(toks)
    vecs = cv.transform(toks)
    lda = LDA(
        k=n_topics,
        maxIter=max_iter,
        seed=seed,
        featuresCol="_tf",
        optimizer="online",
    ).fit(vecs)
    return TopicFilterModel(cv=cv, lda=lda)
