"""Char-n-gram language ID (plans/text.py): the classifier must actually
discriminate on real multilingual snippets (the driver corpus is
language-less word-soup, so the oracle-parity check alone can't prove
discrimination)."""

from pyspark.sql import functions as F

from owl_n4j_spark.plans.text import predict_lang

SNIPPETS = [
    ("en", "the quick brown fox is jumping over the lazy dog and the cat"),
    ("en", "this is the story of the house and the garden of eden"),
    ("de", "der Hund und die Katze sind in der Küche und der Garten ist schön"),
    ("de", "das ist die Geschichte der deutschen Sprache und der Literatur"),
    ("es", "el perro que ladra no muerde y los gatos que duermen en el sol"),
    ("es", "la canción que cantamos es una tradición de los pueblos"),
    ("fr", "le chat est sur la table et les enfants sont dans une maison"),
    ("fr", "les fleurs est une des merveilles de le jardin des plantes"),
    ("zh", "你好世界这是一个中文句子用来测试语言识别"),
    ("unk", "xyzzy qwerty 12345 zzz"),
]


def test_predict_lang_on_real_snippets(spark):
    df = spark.createDataFrame(SNIPPETS, "want string, text string")
    got = df.select("want", predict_lang(F.col("text")).alias("pred")).collect()
    wrong = [(r["want"], r["pred"]) for r in got if r["want"] != r["pred"]]
    assert not wrong, wrong


def test_predict_lang_deterministic_tie(spark):
    # a string matching no profile at all -> unk, never an arbitrary label
    df = spark.createDataFrame([("zzz",)], "text string")
    assert df.select(predict_lang(F.col("text")).alias("p")) \
             .collect()[0]["p"] == "unk"
