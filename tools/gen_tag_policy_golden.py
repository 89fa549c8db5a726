#!/usr/bin/env python3
"""Generate golden fixtures for the P1 (apply_tag_policy) and P2
(parse_ai_response) ports by running the REFERENCE implementation offline
over randomized inputs, pinning its outputs.

The fixtures live in src/test/resources/golden/ and are asserted
row-for-row by TagPolicyGoldenSpec / AiResponseParserGoldenSpec — if any
branch of graft.policy.TagPolicy or AiResponseParser drifts from
tag_policy.py:557-976 / refitd_tagger.py:1144-1281, the suite fails.

Inputs cover: every category branch (top/top_base/top_mid/bottom/
footwear/unknown/absent), threshold boundary confidences at every
PolicyThresholds field (exact and one-ulp-below), illegal tags,
cross-category tags, missing fields, layer-role keyword hits/misses,
string/int/bool/garbage confidences, markdown fences and junk around the
JSON, and broken JSON.

Usage: python3 tools/gen_tag_policy_golden.py   (regenerates in place)
"""
import json
import random
import sys
import types

# `rich` is not installed in this container and is only used by the
# reference for console output — stub it before import.
for name in ("rich", "rich.console", "rich.progress"):
    sys.modules[name] = types.ModuleType(name)


class _Null:
    def __init__(self, *a, **k):
        pass

    def print(self, *a, **k):
        pass


sys.modules["rich.console"].Console = _Null
sys.modules["rich.progress"].Progress = _Null
sys.modules["rich.progress"].SpinnerColumn = _Null
sys.modules["rich.progress"].TextColumn = _Null

# Load tag_policy/refitd_tagger directly under a synthetic package —
# the real `src.ai.__init__` drags in chat/embeddings modules with heavy
# third-party imports that are irrelevant here.
import importlib.util  # noqa: E402

_pkg = types.ModuleType("refai")
_pkg.__path__ = ["/root/reference/src/ai"]
sys.modules["refai"] = _pkg


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"refai.{name}", f"/root/reference/src/ai/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refai.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


rt = _load("refitd_tagger")
tp = _load("tag_policy")

rng = random.Random(42)

OUT_DIR = "src/main/../test/resources/golden"

STYLE = sorted(rt.STYLE_IDENTITY_TAGS)
FIT_ALL = sorted(set(rt.FIT_TAGS_BOTTOM) | set(rt.FIT_TAGS_UPPER))
SIL_ALL = sorted(set(rt.SILHOUETTE_BOTTOM_TAGS) | set(rt.SILHOUETTE_UPPER_TAGS))
LENGTH = sorted(rt.LENGTH_TAGS)
FORMALITY = sorted(rt.FORMALITY_TAGS)
CONTEXT = sorted(rt.CONTEXT_TAGS)
DETAILS_ALL = sorted(set(rt.DETAILS_BOTTOM_TAGS) | set(rt.DETAILS_UPPER_TAGS))
PATTERN = sorted(rt.PATTERN_TAGS)
PAIRING = sorted(rt.PAIRING_TAGS)
SHOE_TYPE = sorted(rt.SHOE_TYPE_TAGS)
SHOE_PROFILE = sorted(rt.SHOE_PROFILE_TAGS)
SHOE_CLOSURE = sorted(rt.SHOE_CLOSURE_TAGS)

ILLEGAL = ["spacewear", "bogus-tag", "STREETWEAR", "casual ", "x"]

# Exact threshold values from PolicyThresholds plus one-ulp/epsilon-below
# neighbours — every >=/< comparison in the policy gets both sides.
BOUNDS = [0.65, 0.70, 0.75, 0.80, 0.85]
CONFS = (
    BOUNDS
    + [b - 1e-9 for b in BOUNDS]
    + [b - 0.01 for b in BOUNDS]
    + [0.0, 0.1, 0.3, 0.5, 0.6, 0.9, 0.95, 1.0]
)

CATEGORIES = ["top", "top_base", "top_mid", "bottom", "footwear", "dress", None]

NAMES = [
    "", "Merino crew sweater", "Heavy fleece hoodie", "Basic Tee",
    "oxford shirt", "cargo pant", "Chelsea boot", "knit pullover",
    "Long sleeve henley", "quilted liner jacket", None,
]
SUBCATS = ["", "sweatshirts", "t-shirts", "knitwear", "polos", None]


def conf():
    if rng.random() < 0.7:
        return float(rng.choice(CONFS))
    return round(rng.uniform(0.0, 1.0), 3)


def twc(pool, p_illegal=0.25):
    tag = rng.choice(ILLEGAL) if rng.random() < p_illegal else rng.choice(pool)
    d = {"tag": tag, "confidence": conf()}
    if rng.random() < 0.25:
        d["reasoning"] = "synthetic reasoning"
    return d


def p1_case():
    category = rng.choice(CATEGORIES)
    raw = {}
    if rng.random() < 0.3:
        raw["category"] = rng.choice(["top", "bottom", "footwear"])
    if rng.random() < 0.9:
        raw["style_identity"] = [twc(STYLE) for _ in range(rng.randint(0, 4))]
    scalar_pools = {
        "fit": FIT_ALL, "silhouette": SIL_ALL, "length": LENGTH,
        "formality": FORMALITY, "pattern": PATTERN, "shoe_type": SHOE_TYPE,
        "profile": SHOE_PROFILE, "closure": SHOE_CLOSURE,
    }
    for key, pool in scalar_pools.items():
        if rng.random() < 0.6:
            raw[key] = twc(pool)
    for key, pool in (("context", CONTEXT),
                      ("construction_details", DETAILS_ALL),
                      ("pairing_tags", PAIRING)):
        if rng.random() < 0.6:
            raw[key] = [twc(pool) for _ in range(rng.randint(0, 4))]
    product_name = rng.choice(NAMES)
    subcategory = rng.choice(SUBCATS)
    res = tp.apply_tag_policy(
        raw, category=category, product_name=product_name,
        subcategory=subcategory)
    return {
        "tags_ai_raw": raw,
        "category": category,
        "product_name": product_name,
        "subcategory": subcategory,
        "expected": res.to_dict(),
    }


def p2_case():
    category = rng.choice(["top", "top_base", "bottom", "footwear", "dress"])
    data = {}
    if rng.random() < 0.85:
        data["style_identity"] = [
            twc(STYLE) for _ in range(rng.randint(0, 4))]
    for key, pool in (("fit", FIT_ALL), ("silhouette", SIL_ALL),
                      ("length", LENGTH), ("formality", FORMALITY),
                      ("pattern", PATTERN), ("shoe_type", SHOE_TYPE),
                      ("profile", SHOE_PROFILE), ("closure", SHOE_CLOSURE)):
        if rng.random() < 0.55:
            data[key] = twc(pool)
    for key, pool in (("context", CONTEXT),
                      ("construction_details", DETAILS_ALL),
                      ("pairing_tags", PAIRING)):
        if rng.random() < 0.55:
            data[key] = [twc(pool) for _ in range(rng.randint(0, 5))]
    # confidence-shape quirks the parser must clamp identically
    quirk = rng.random()
    if data and quirk < 0.35:
        victim = rng.choice(sorted(data))
        entry = data[victim][0] if isinstance(data[victim], list) and data[victim] \
            else (data[victim] if isinstance(data[victim], dict) else None)
        if entry is not None:
            entry["confidence"] = rng.choice(
                ["0.8", "1.5", "-2", "abc", 2, -1, 0, 1, True, False, None,
                 "  0.55  "])
    # list entries that are not dicts are skipped by both implementations
    if rng.random() < 0.15:
        data.setdefault("context", []).insert(0, "not-a-dict")
    body = json.dumps(data)
    wrap = rng.choice(["plain", "fence", "prefix", "suffix", "no_json",
                       "broken", "plain", "plain"])
    if wrap == "plain":
        response = body
    elif wrap == "fence":
        response = "```json\n" + body + "\n```"
    elif wrap == "prefix":
        response = "Here are the tags you asked for:\n" + body
    elif wrap == "suffix":
        # no closing brace after the JSON — greedy regex stays exact
        response = body + "\nHope this helps!"
    elif wrap == "no_json":
        response = "I could not tag this product."
    else:
        response = "{ this is not : valid json"
    expected = rt.parse_ai_response(response, category)
    return {"response": response, "category": category, "expected": expected}


def main():
    import os
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "golden")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "tag_policy_golden.jsonl"), "w") as f:
        for _ in range(2000):
            f.write(json.dumps(p1_case(), sort_keys=True) + "\n")
    with open(os.path.join(out, "ai_parse_golden.jsonl"), "w") as f:
        for _ in range(800):
            f.write(json.dumps(p2_case(), sort_keys=True) + "\n")
    print("wrote golden fixtures to", out)


if __name__ == "__main__":
    main()
