"""Porter stemmer golden vectors (FIXTURES.md §4; pairs from the
reference Stemmer.java comments and the published Porter test set)."""

from search_engine_ray.functions.stemmer import porter_stem, CachingStemmer

GOLDEN = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
    # disabled/matting/mating/meeting/milling/messing/meetings from
    # Stemmer.java:209-229 comments
    "disabled": "disabl",
    "matting": "mat",
    "mating": "mate",
    "meeting": "meet",
    "milling": "mill",
    "messing": "mess",
    "meetings": "meet",
    # analogi family (logi->log revision present in reference)
    "analogi": "analog",
    # bli->ble revision
    "possibli": "possibl",
}


def test_golden_vectors():
    bad = {w: (porter_stem(w), want) for w, want in GOLDEN.items() if porter_stem(w) != want}
    assert not bad, bad


def test_short_words_unchanged():
    for w in ["a", "ab", "is", "be", "x", ""]:
        assert porter_stem(w) == w


def test_caching_stemmer_matches():
    s = CachingStemmer()
    words = list(GOLDEN) * 2
    assert s.stem_many(words) == [porter_stem(w) for w in words]


def test_idempotent_on_stems():
    # stems of stems do not oscillate for the golden set
    for w, stem in GOLDEN.items():
        assert isinstance(porter_stem(stem), str)
