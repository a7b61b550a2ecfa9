// Native JSON field projector for the columnar filter engine
// (syzgydb_tpu/query/columnar.py).
//
// One pass over N concatenated metadata documents extracts the top-level
// scalar values of the requested fields into typed arrays — the ~1.2s/1M-row
// python json.loads pass drops to ~0.1s, which is the cold-query cost of a
// filtered search (warm queries are numpy mask algebra either way).
//
// Parity contract with python json.loads(parse_int=float):
//   * any row this parser cannot handle EXACTLY like python json (escape
//     sequences in relevant strings, NaN/Infinity literals, unicode keys,
//     duplicate-key edge cases beyond last-wins, trailing garbage, depth
//     past the skip limit) is flagged JP_ROW_FALLBACK and re-parsed by the
//     python engine — native handles the fast common case, python defines
//     the semantics.
//   * duplicate keys: last occurrence wins (python dict behavior).
//   * numbers parse with strtod (== float(json number) for doubles).
//
// Row flags: 0 = parsed ok (dict), 1 = python-fallback needed (includes
// non-object top levels — python distinguishes broken from non-dict).
// Value kinds per (row, field): 0 absent, 1 number, 2 string, 3 true/false
// (number slot holds 0/1), 4 null, 5 non-scalar (array/object).

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Cursor {
    const uint8_t* p;
    const uint8_t* end;
    bool fail = false;  // fall back to python for this row
};

// strict JSON number grammar: -?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?
// — strtod alone accepts 01, 1., 0x10, inf/nan, which json.loads rejects
inline bool is_json_number(const uint8_t* p, size_t n) {
    size_t i = 0;
    if (i < n && p[i] == '-') ++i;
    if (i >= n) return false;
    if (p[i] == '0') {
        ++i;
    } else if (p[i] >= '1' && p[i] <= '9') {
        while (i < n && p[i] >= '0' && p[i] <= '9') ++i;
    } else {
        return false;
    }
    if (i < n && p[i] == '.') {
        ++i;
        if (i >= n || p[i] < '0' || p[i] > '9') return false;
        while (i < n && p[i] >= '0' && p[i] <= '9') ++i;
    }
    if (i < n && (p[i] == 'e' || p[i] == 'E')) {
        ++i;
        if (i < n && (p[i] == '+' || p[i] == '-')) ++i;
        if (i >= n || p[i] < '0' || p[i] > '9') return false;
        while (i < n && p[i] >= '0' && p[i] <= '9') ++i;
    }
    return i == n;
}

// json.loads(bytes) UTF-8-decodes the WHOLE document before parsing, so
// invalid byte sequences anywhere — including strings/keys this parser
// skips — reject the doc in python; such rows must ride the fallback
// (review finding r5, confirmed divergence).
inline bool valid_utf8(const uint8_t* p, const uint8_t* end) {
    while (p < end) {
        uint8_t b = *p;
        if (b < 0x80) {
            ++p;
            continue;
        }
        int n;
        uint32_t cp;
        if ((b & 0xE0) == 0xC0) {
            n = 1;
            cp = b & 0x1F;
        } else if ((b & 0xF0) == 0xE0) {
            n = 2;
            cp = b & 0x0F;
        } else if ((b & 0xF8) == 0xF0) {
            n = 3;
            cp = b & 0x07;
        } else {
            return false;
        }
        if (end - p <= n) return false;
        for (int i = 1; i <= n; ++i) {
            if ((p[i] & 0xC0) != 0x80) return false;
            cp = (cp << 6) | (p[i] & 0x3F);
        }
        if (n == 1 && cp < 0x80) return false;  // overlong
        if (n == 2 && (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)))
            return false;  // overlong / surrogate
        if (n == 3 && (cp < 0x10000 || cp > 0x10FFFF)) return false;
        p += n + 1;
    }
    return true;
}

inline void skip_ws(Cursor& c) {
    while (c.p < c.end && (*c.p == ' ' || *c.p == '\t' || *c.p == '\n' ||
                           *c.p == '\r'))
        ++c.p;
}

// Scan a JSON string starting at the opening quote; returns [start, len) of
// the raw contents and whether it contains escapes. Cursor ends past the
// closing quote.
inline bool scan_string(Cursor& c, const uint8_t** out, uint32_t* len,
                        bool* has_escape) {
    if (c.p >= c.end || *c.p != '"') return false;
    ++c.p;
    const uint8_t* start = c.p;
    bool esc = false;
    while (c.p < c.end) {
        uint8_t ch = *c.p;
        if (ch < 0x20) return false;  // raw control char: json.loads rejects
        if (ch == '\\') {
            // only legal JSON escapes: an invalid one (e.g. \x) must fail
            // the parse so the row takes the python fallback — json.loads
            // rejects the whole doc even when the string is skipped
            // (review finding r5, confirmed divergence)
            esc = true;
            if (c.p + 1 >= c.end) return false;
            uint8_t nx = c.p[1];
            if (nx == 'u') {
                if (c.end - c.p < 6) return false;
                for (int i = 2; i < 6; ++i) {
                    uint8_t h = c.p[i];
                    if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                          (h >= 'A' && h <= 'F')))
                        return false;
                }
                c.p += 6;
            } else if (nx == '"' || nx == '\\' || nx == '/' || nx == 'b' ||
                       nx == 'f' || nx == 'n' || nx == 'r' || nx == 't') {
                c.p += 2;
            } else {
                return false;
            }
            continue;
        }
        if (ch == '"') {
            *out = start;
            *len = static_cast<uint32_t>(c.p - start);
            *has_escape = esc;
            ++c.p;
            return true;
        }
        ++c.p;
    }
    return false;
}

// Skip any JSON value (nested containers allowed, bounded depth).
bool skip_value(Cursor& c, int depth) {
    if (depth > 64) return false;
    skip_ws(c);
    if (c.p >= c.end) return false;
    uint8_t ch = *c.p;
    if (ch == '"') {
        const uint8_t* s;
        uint32_t l;
        bool e;
        return scan_string(c, &s, &l, &e);
    }
    if (ch == '{' || ch == '[') {
        uint8_t close = ch == '{' ? '}' : ']';
        ++c.p;
        skip_ws(c);
        if (c.p < c.end && *c.p == close) {
            ++c.p;
            return true;
        }
        while (c.p < c.end) {
            if (ch == '{') {
                skip_ws(c);
                const uint8_t* s;
                uint32_t l;
                bool e;
                if (!scan_string(c, &s, &l, &e)) return false;
                skip_ws(c);
                if (c.p >= c.end || *c.p != ':') return false;
                ++c.p;
            }
            if (!skip_value(c, depth + 1)) return false;
            skip_ws(c);
            if (c.p >= c.end) return false;
            if (*c.p == ',') {
                ++c.p;
                continue;
            }
            if (*c.p == close) {
                ++c.p;
                return true;
            }
            return false;
        }
        return false;
    }
    // number / true / false / null — scan and VALIDATE the token
    // (accepting arbitrary junk here would mark broken docs parsed-ok)
    const uint8_t* start = c.p;
    while (c.p < c.end && *c.p != ',' && *c.p != '}' && *c.p != ']' &&
           *c.p != ' ' && *c.p != '\t' && *c.p != '\n' && *c.p != '\r')
        ++c.p;
    size_t tl = static_cast<size_t>(c.p - start);
    if (tl == 0) return false;
    if (tl == 4 && (memcmp(start, "true", 4) == 0 ||
                    memcmp(start, "null", 4) == 0))
        return true;
    if (tl == 5 && memcmp(start, "false", 5) == 0) return true;
    return is_json_number(start, tl);
}

}  // namespace

extern "C" {

// data: concatenated documents; starts/lens index into it (n rows).
// fields: nf zero-terminated UTF-8 field names, field_lens their lengths.
// Outputs are (n, nf) row-major: kinds, nums, str_off (into data),
// str_len (-1 when the string has escapes -> python decodes that one).
// row_flags: (n,) see header comment.
void jp_extract(const uint8_t* data, const uint64_t* starts,
                const uint32_t* lens, uint64_t n, const char* const* fields,
                const uint32_t* field_lens, uint32_t nf, uint8_t* kinds,
                double* nums, int64_t* str_off, int32_t* str_len,
                uint8_t* row_flags) {
    for (uint64_t r = 0; r < n; ++r) {
        uint8_t* k = kinds + r * nf;
        double* v = nums + r * nf;
        int64_t* so = str_off + r * nf;
        int32_t* sl = str_len + r * nf;
        memset(k, 0, nf);

        Cursor c{data + starts[r], data + starts[r] + lens[r]};
        if (!valid_utf8(c.p, c.end)) {
            row_flags[r] = 1;  // json.loads(bytes) rejects non-UTF-8 docs
            continue;
        }
        skip_ws(c);
        if (c.p >= c.end) {
            row_flags[r] = 1;  // empty: python decides (it rejects)
            continue;
        }
        if (*c.p != '{') {
            // could be a non-object JSON value or garbage; python decides
            // between "not a dict" and "broken" — flag fallback
            row_flags[r] = 1;
            continue;
        }
        ++c.p;
        skip_ws(c);
        bool ok = true;
        if (c.p < c.end && *c.p == '}') {
            ++c.p;
        } else {
            while (true) {
                skip_ws(c);
                const uint8_t* ks;
                uint32_t kl;
                bool kesc;
                if (!scan_string(c, &ks, &kl, &kesc)) {
                    ok = false;
                    break;
                }
                if (kesc) {  // escaped key: python decodes
                    ok = false;
                    break;
                }
                skip_ws(c);
                if (c.p >= c.end || *c.p != ':') {
                    ok = false;
                    break;
                }
                ++c.p;
                skip_ws(c);
                // does the key match a requested field?
                int fi = -1;
                for (uint32_t f = 0; f < nf; ++f) {
                    if (field_lens[f] == kl &&
                        memcmp(fields[f], ks, kl) == 0) {
                        fi = static_cast<int>(f);
                        break;
                    }
                }
                if (fi < 0) {
                    if (!skip_value(c, 0)) {
                        ok = false;
                        break;
                    }
                } else {
                    uint8_t ch = c.p < c.end ? *c.p : 0;
                    if (ch == '"') {
                        const uint8_t* s;
                        uint32_t l;
                        bool esc;
                        if (!scan_string(c, &s, &l, &esc)) {
                            ok = false;
                            break;
                        }
                        k[fi] = 2;
                        so[fi] = s - data;
                        sl[fi] = esc ? -1 : static_cast<int32_t>(l);
                    } else if (ch == 't' && c.end - c.p >= 4 &&
                               memcmp(c.p, "true", 4) == 0) {
                        k[fi] = 3;
                        v[fi] = 1.0;
                        c.p += 4;
                    } else if (ch == 'f' && c.end - c.p >= 5 &&
                               memcmp(c.p, "false", 5) == 0) {
                        k[fi] = 3;
                        v[fi] = 0.0;
                        c.p += 5;
                    } else if (ch == 'n' && c.end - c.p >= 4 &&
                               memcmp(c.p, "null", 4) == 0) {
                        k[fi] = 4;
                        c.p += 4;
                    } else if (ch == '-' || (ch >= '0' && ch <= '9')) {
                        char buf[48];
                        const uint8_t* tstart = c.p;
                        while (c.p < c.end && *c.p != ',' && *c.p != '}' &&
                               *c.p != ' ' && *c.p != '\t' && *c.p != '\n' &&
                               *c.p != '\r')
                            ++c.p;
                        size_t tl = static_cast<size_t>(c.p - tstart);
                        if (tl == 0 || tl >= sizeof(buf) ||
                            !is_json_number(tstart, tl)) {
                            ok = false;
                            break;
                        }
                        memcpy(buf, tstart, tl);
                        buf[tl] = 0;
                        char* endp = nullptr;
                        double d = strtod(buf, &endp);
                        if (endp != buf + tl) {  // 1e999, 0x.., partial junk
                            ok = false;
                            break;
                        }
                        k[fi] = 1;
                        v[fi] = d;
                    } else if (ch == '{' || ch == '[') {
                        if (!skip_value(c, 0)) {
                            ok = false;
                            break;
                        }
                        k[fi] = 5;
                    } else {
                        // NaN/Infinity and anything else: python semantics
                        ok = false;
                        break;
                    }
                }
                skip_ws(c);
                if (c.p < c.end && *c.p == ',') {
                    ++c.p;
                    continue;
                }
                if (c.p < c.end && *c.p == '}') {
                    ++c.p;
                    break;
                }
                ok = false;
                break;
            }
        }
        if (ok) {
            skip_ws(c);
            if (c.p != c.end) ok = false;  // trailing garbage: python decides
        }
        row_flags[r] = ok ? 0 : 1;
        if (!ok) memset(k, 0, nf);
    }
}

}  // extern "C"
