#!/usr/bin/env python
"""Re-record tests/fixtures/espeak_golden.json against a LIVE espeak-ng.

This environment has no espeak build, so the committed fixtures pin the
reference's documented worked examples plus hand-built behavior classes
(see the fixture's ``_contract``). On any host with ``espeak-ng`` + the
``phonemizer`` package installed, run:

    python tools/record_espeak_golden.py            # prints the diff
    python tools/record_espeak_golden.py --write    # rewrites the fixture

The recorder re-converts every phrase and word in the fixture through the
EXACT backend construction the pipeline uses (phonemes.py; the reference's
tts/data/text/phonemes.py:9-15) and stamps ``espeak_ng_version`` /
``phonemizer_version`` into the file, so drift between espeak builds is a
visible re-record instead of silent divergence.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

FIXTURE = Path(__file__).resolve().parent.parent / "tests/fixtures/espeak_golden.json"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--language", default="en-us")
    args = ap.parse_args()

    try:
        import phonemizer
        from phonemizer.backend import EspeakBackend
        from phonemizer.separator import Separator
    except ImportError:
        print("needs the `phonemizer` package (and an espeak-ng install); "
              "this environment has neither — run on a phonemization host",
              file=sys.stderr)
        return 2

    backend = EspeakBackend(args.language, preserve_punctuation=True,
                            with_stress=True, language_switch="remove-flags")
    sep = Separator(phone="", word="|")

    def convert(text: str) -> str:
        return backend.phonemize([text], separator=sep, strip=True)[0]

    data = json.loads(FIXTURE.read_text())
    changed = []
    for section in ("phrases", "words"):
        for key in sorted(data.get(section, {})):
            live = convert(key)
            if live != data[section][key]:
                changed.append((section, key, data[section][key], live))
                data[section][key] = live

    version = getattr(EspeakBackend, "version", lambda: "unknown")()
    data["espeak_ng_version"] = str(version)
    data["phonemizer_version"] = phonemizer.__version__

    for section, key, old, new in changed:
        print(f"{section}/{key!r}: {old!r} -> {new!r}")
    print(f"espeak-ng {version}, phonemizer {phonemizer.__version__}, "
          f"{len(changed)} entr{'y' if len(changed) == 1 else 'ies'} changed")
    if args.write:
        FIXTURE.write_text(json.dumps(data, ensure_ascii=False, indent=1))
        print(f"wrote {FIXTURE}")
    elif changed:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
