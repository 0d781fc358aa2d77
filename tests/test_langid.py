"""Char-ngram langid must beat the stopword heuristic on stopword-free
text: orthography (umlauts, ñ/ción, accents, CJK) lives in char
trigrams, not in an 8-word stoplist."""

from __future__ import annotations

from saurav_nayak_recipe_etl_project_spark.operators.text import (
    charngram_langid,
    stopword_langid,
)

SCHEMA = "doc_id long, lang string, text string"

TRAIN = [
    (100, "de", "zwölf boxkämpfer jagen viktor quer über deichkämme hinweg"),
    (101, "de", "schönes fräulein bäckerei straße größe weiß müde für über"),
    (102, "de", "frühstück geschwindigkeit schifffahrt häuser bäume küche"),
    (103, "en", "sphinx of black quartz judge my vow quickly jumping foxes"),
    (104, "en", "pack my box with five dozen liquor jugs right now please"),
    (105, "en", "bright vixens jump dozy fowl quack through the night sky"),
    (106, "es", "jovencillo emponzoñado añejo whisky cigüeña niño mañana señor"),
    (107, "es", "corazón canción atención situación pequeño español compañía"),
    (108, "es", "años enseñanza montaña sueño baño señal otoño campaña"),
    (109, "fr", "portez ce vieux whisky au juge blond qui fume très tôt été"),
    (110, "fr", "français déjà voilà château forêt hôtel naïve œuvre cœur"),
    (111, "fr", "élève médecin téléphone préférée crêpe fenêtre août île"),
    (112, "zh", "数据处理引擎在大规模集群上运行查询计划优化器"),
    (113, "zh", "分布式计算框架支持流式处理和批量处理任务调度"),
    (114, "zh", "机器学习模型训练需要大量高质量的语料数据清洗"),
]

# stopword-free test docs: stoplist hits are zero for every language,
# so the stopword path degrades to 'und' while char profiles still see
# the orthography
TEST = [
    (1, "de", "gemütliche bäckereien öffnen früh größere brötchen schön"),
    (2, "de", "müller kämpft über grünen wäldern südlich für jährliche"),
    (3, "en", "quick brown foxes jump over lazy dogs during bright days"),
    (4, "en", "zebras vex judges with quirky photos right behind walls"),
    (5, "es", "pequeños niños sueñan cañones señales montañas añoranza"),
    (6, "es", "compañeros españoles enseñan canciones otoñales mañanas"),
    (7, "fr", "élèves français préfèrent crêpes chaudes près château"),
    (8, "fr", "forêts môles œuvres très jolies déjà fumées tôt hôtels"),
    (9, "zh", "查询优化器选择最佳执行计划进行数据扫描"),
    (10, "zh", "流式处理框架调度批量计算任务集群运行"),
]


def _acc(rows):
    return sum(r["predicted_lang"] == r["labeled_lang"] for r in rows) / len(rows)


def test_charngram_beats_stopwords_on_stopword_free_text(spark):
    train = spark.createDataFrame(TRAIN, SCHEMA)
    test = spark.createDataFrame(TEST, SCHEMA)
    ngram_acc = _acc(charngram_langid(test, profile_docs=train).collect())
    stop_acc = _acc(stopword_langid(test).collect())
    assert ngram_acc >= 0.8, ngram_acc
    assert ngram_acc > stop_acc, (ngram_acc, stop_acc)


def test_charngram_langid_deterministic(spark):
    train = spark.createDataFrame(TRAIN, SCHEMA)
    test = spark.createDataFrame(TEST, SCHEMA)
    r1 = sorted(map(tuple, charngram_langid(test, profile_docs=train).collect()))
    r2 = sorted(map(tuple, charngram_langid(test, profile_docs=train).collect()))
    assert r1 == r2
