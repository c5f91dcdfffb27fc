"""Spelled-number normalization for English WER scoring.

From-scratch implementation of the behavior of the reference's
EnglishNumberNormalizer (hf english_normalizer.py:96-498): spelled-out
numbers become arabic numerals while keeping suffixes (1960s, 32nd),
currency words collapse onto the amount (twenty dollars -> $20, emitted as
"$20" then post-processed to "20 dollars" downstream like the reference),
"point" starts a digit-wise decimal, "double/triple" expand digits,
successive single digits concatenate nominally (one oh one -> 101), and
"per cent"/"percent" becomes %.

Covers the documented common-case behavior; a handful of exotic
constructions (e.g. fractions-in-words) may differ from the reference —
the test battery pins the agreed surface.
"""

from __future__ import annotations

import re

_ONES = {n: i for i, n in enumerate(
    ["one", "two", "three", "four", "five", "six", "seven", "eight",
     "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
     "sixteen", "seventeen", "eighteen", "nineteen"], start=1)}
_TENS = {"twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
         "seventy": 70, "eighty": 80, "ninety": 90}
_MULT = {"hundred": 10 ** 2, "thousand": 10 ** 3, "million": 10 ** 6,
         "billion": 10 ** 9, "trillion": 10 ** 12}
_ZEROS = {"o", "oh", "zero"}

_ONES_SUFFIXED: dict[str, tuple[int, str]] = {}
for name, v in _ONES.items():
    _ONES_SUFFIXED["sixes" if name == "six" else name + "s"] = (v, "s")
_ONES_SUFFIXED.update({
    "zeroth": (0, "th"), "first": (1, "st"), "second": (2, "nd"),
    "third": (3, "rd"), "fifth": (5, "th"), "twelfth": (12, "th")})
for name, v in _ONES.items():
    if v > 3 and v not in (5, 12):
        _ONES_SUFFIXED[name + ("h" if name.endswith("t") else "th")] = \
            (v, "th")
_TENS_SUFFIXED = {**{n.replace("y", "ies"): (v, "s")
                     for n, v in _TENS.items()},
                  **{n.replace("y", "ieth"): (v, "th")
                     for n, v in _TENS.items()}}
_MULT_SUFFIXED = {**{n + "s": (v, "s") for n, v in _MULT.items()},
                  **{n + "th": (v, "th") for n, v in _MULT.items()}}

_CURRENCY = {"pound": "£", "pounds": "£", "euro": "€", "euros": "€",
             "dollar": "$", "dollars": "$", "cent": "¢", "cents": "¢"}
_SIGNS = {"minus": "-", "negative": "-", "plus": "+", "positive": "+"}


class EnglishNumberNormalizer:
    def __call__(self, text: str) -> str:
        words = text.split()
        out: list[str] = []
        i = 0
        n = len(words)

        def is_number_word(w: str) -> bool:
            return (w in _ONES or w in _TENS or w in _MULT or w in _ZEROS
                    or w in _ONES_SUFFIXED or w in _TENS_SUFFIXED
                    or w in _MULT_SUFFIXED or w in _SIGNS
                    or re.fullmatch(r"\d+(\.\d+)?", w) is not None)

        while i < n:
            w = words[i]
            if not (is_number_word(w)
                    or (w in ("double", "triple")
                        and i + 1 < n and (words[i + 1] in _ZEROS
                                           or words[i + 1] in _ONES))):
                out.append(w)
                i += 1
                continue
            value, suffix, j = self._parse_number(words, i)
            if value is None:
                out.append(w)
                i += 1
                continue
            # currency word directly after the amount
            if j < n and words[j] in _CURRENCY:
                out.append(_CURRENCY[words[j]] + value)
                j += 1
            elif j < n and words[j] == "percent":
                out.append(value + "%")
                j += 1
            elif (j + 1 < n and words[j] == "per"
                    and words[j + 1] == "cent"):
                out.append(value + "%")
                j += 2
            else:
                out.append(value + suffix)
            i = j
        # like the reference, currency stays in symbol form ($25, ¢50) —
        # the EnglishTextNormalizer keeps those symbols when digits follow
        return " ".join(out)

    # ------------------------------------------------------------------
    def _parse_number(self, words: list[str], i: int
                      ) -> tuple[str | None, str, int]:
        """Parse a spelled number starting at i; returns
        (digits-string | None, suffix, next-index)."""
        n = len(words)
        sign = ""
        if words[i] in _SIGNS:
            if i + 1 >= n:
                return None, "", i
            sign = _SIGNS[words[i]]
            i += 1

        total = 0          # completed groups (e.g. thousands)
        current = 0        # current group < multiplier
        parts: list[str] = []    # year-style 2-digit groups (nineteen sixty)
        digits: list[str] = []   # nominal digit mode (one oh one)
        nominal = False
        suffix = ""
        consumed = False
        j = i
        while j < n:
            w = words[j]
            if re.fullmatch(r"\d+(\.\d+)?", w):
                if consumed:
                    break
                digits = [w]
                nominal = True
                consumed = True
                j += 1
                continue
            if w in _ZEROS:
                nominal = True
                digits.append(self._flush_digits(total, current)
                              if consumed and not digits else "")
                digits = [d for d in digits if d != ""]
                digits.append("0")
                total = current = 0
                consumed = True
                j += 1
                continue
            if w in ("double", "triple") and j + 1 < n and \
                    (words[j + 1] in _ZEROS or words[j + 1] in _ONES):
                rep = 2 if w == "double" else 3
                d = "0" if words[j + 1] in _ZEROS else \
                    str(_ONES[words[j + 1]])
                digits.extend([d] * rep)
                nominal = True
                consumed = True
                j += 2
                continue
            if w in _ONES:
                v = _ONES[w]
                if nominal:
                    digits.append(str(v))
                elif current % 10 == 0 and (current == 0 or v < 10):
                    current += v
                else:
                    # "one two" style run -> nominal
                    digits.append(self._flush_digits(total, current))
                    digits.append(str(v))
                    nominal = True
                    total = current = 0
                consumed = True
                j += 1
                continue
            if w in _TENS:
                if nominal:
                    break
                if 0 < current < 100 and total == 0:
                    # year-style concatenation: nineteen sixty -> 19|60
                    # (only complete two-digit groups; "one hundred twenty"
                    # extends normally)
                    parts.append(str(current))
                    current = _TENS[w]
                else:
                    current += _TENS[w]
                consumed = True
                j += 1
                continue
            if w in _MULT:
                if nominal:
                    break
                m = _MULT[w]
                if m == 100:
                    current = (current or 1) * 100
                else:
                    total += (current or 1) * m
                    current = 0
                consumed = True
                j += 1
                continue
            if w in _ONES_SUFFIXED or w in _TENS_SUFFIXED \
                    or w in _MULT_SUFFIXED:
                v, suf = (_ONES_SUFFIXED.get(w) or _TENS_SUFFIXED.get(w)
                          or _MULT_SUFFIXED.get(w))
                if w in _MULT_SUFFIXED:
                    total += (current or 1) * v
                    current = 0
                elif (w in _TENS_SUFFIXED and 0 < current < 100
                        and total == 0):
                    parts.append(str(current))   # nineteen sixties -> 1960s
                    current = v
                else:
                    current += v
                suffix = suf
                consumed = True
                j += 1
                break                       # suffix always ends a number
            if w == "point" and consumed:
                # decimal: digits follow one by one
                int_part = (("".join(digits)) if nominal
                            else str(total + current))
                frac = []
                j += 1
                while j < n and (words[j] in _ZEROS or words[j] in _ONES):
                    frac.append("0" if words[j] in _ZEROS
                                else str(_ONES[words[j]]))
                    j += 1
                return (f"{sign}{int_part}.{''.join(frac)}", "", j)
            if w == "and" and consumed and not nominal and \
                    j + 1 < n and (words[j + 1] in _ONES
                                   or words[j + 1] in _TENS):
                j += 1
                continue
            break

        if not consumed:
            return None, "", j
        if nominal:
            value = "".join(digits)
        elif parts:
            value = "".join(parts) + str(total + current).zfill(2)
        else:
            value = str(total + current)
        return sign + value, suffix, j

    @staticmethod
    def _flush_digits(total: int, current: int) -> str:
        v = total + current
        return str(v) if v else ""

