/* Fused C HTML parser: full WHATWG tokenizer + tree construction over the
 * UTF-8 bytes of a Python str, building the tree in a C node arena and
 * materializing the Python DOM (kernel/dom.py classes) in one final DFS.
 *
 * Semantics are a line-for-line port of kernel/tokenizer.py and
 * kernel/treebuilder.py (which themselves re-derive the reference parser,
 * /root/reference/Sources/HTMLParser.m + HTMLTokenizer.m). Anything outside
 * the ported subset — fragment parsing, error collection — BAILS:
 * parse() returns None and the caller runs the pure-Python kernel, so
 * behavior is identical by construction. Parity is enforced by the
 * differential tests in tests/test_cparser.py over the conformance corpus
 * and fuzz inputs.
 *
 * Lookup tables (_cparser_tables.h) are GENERATED from the Python sources
 * at build time by _cparser_build.py.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>
#include <stdint.h>
#include "_cparser_tables.h"

/* flag bits — must match _cparser_build.py */
#define F_SPECIAL_HTML       (1<<0)
#define F_FORMATTING         (1<<1)
#define F_SCOPE_BASE         (1<<2)
#define F_SCOPE_LIST_EXTRA   (1<<3)
#define F_SCOPE_BUTTON_EXTRA (1<<4)
#define F_SCOPE_TABLE        (1<<5)
#define F_IMPLIED_END        (1<<6)
#define F_IMPLIED_THOROUGH   (1<<7)
#define F_BREAKOUT           (1<<8)
#define F_SPECIAL_MATHML     (1<<9)
#define F_SPECIAL_SVG        (1<<10)
#define F_HEADING            (1<<11)
#define F_TABLE_SECTION      (1<<12)
#define F_BLOCK_CLOSER       (1<<13)
#define F_BLOCK_OPENER       (1<<14)
#define F_VOID_INBODY        (1<<15)   /* area br embed img keygen wbr */

enum { NS_HTML = 0, NS_MATHML = 1, NS_SVG = 2 };
enum { K_ELEM = 0, K_TEXT = 1, K_COMMENT = 2, K_DOCTYPE = 3, K_DOC = 4 };
enum { QM_NO = 0, QM_QUIRKS = 1, QM_LIMITED = 2 };

/* insertion modes */
enum {
    M_INITIAL, M_BEFORE_HTML, M_BEFORE_HEAD, M_IN_HEAD, M_IN_HEAD_NOSCRIPT,
    M_AFTER_HEAD, M_IN_BODY, M_TEXT, M_IN_TABLE, M_IN_CAPTION,
    M_IN_COLUMN_GROUP, M_IN_TABLE_BODY, M_IN_ROW, M_IN_CELL, M_IN_SELECT,
    M_IN_SELECT_IN_TABLE, M_AFTER_BODY, M_IN_FRAMESET, M_AFTER_FRAMESET,
    M_AFTER_AFTER_BODY, M_AFTER_AFTER_FRAMESET, M_IN_TEMPLATE
};

#define MAX_TMODES 64

/* tokenizer states (match tokenizer.py) */
enum { S_DATA = 0, S_RCDATA = 1, S_RAWTEXT = 2, S_SCRIPT = 3, S_PLAINTEXT = 4 };

enum { TK_CHARS, TK_START, TK_END, TK_COMMENT, TK_DOCTYPE, TK_EOF };
enum { RC_DONE = 0, RC_REPROCESS = 1 };

#define MAX_TOK_ATTRS 48

typedef struct { uint8_t *buf; size_t len, cap; } Pool;

typedef struct {
    uint32_t noff, nlen, voff, vlen;  /* into Parser.ab pool */
} CAttr;

typedef struct {
    uint8_t kind, ns;
    int16_t tag;                       /* TAG_xxx or -1 for unknown */
    int32_t name_off, name_len;        /* unknown tag / doctype name */
    int32_t parent, first_child, last_child, prev_sib, next_sib;
    int32_t attr_start;                /* into Parser.attrs, -1 none */
    int32_t attr_count;
    uint32_t data_off, data_len;       /* text/comment data in Parser.text;
                                          doctype: name in name_off/name_len
                                          (text pool), public/system in
                                          data_off.. via aux fields below */
    uint32_t pub_off, pub_len, sys_off, sys_len;
} CNode;

typedef struct {
    int kind;
    const uint8_t *data; Py_ssize_t dlen;          /* chars / comment */
    int tag;
    const uint8_t *name; Py_ssize_t nlen;          /* lowercased */
    int self_closing;
    int nattrs;
    struct { const uint8_t *n; Py_ssize_t nl;
             const uint8_t *v; Py_ssize_t vl; } a[MAX_TOK_ATTRS];
    int has_name, has_public, has_system, force_quirks;
    const uint8_t *pub; Py_ssize_t publen;
    const uint8_t *sys; Py_ssize_t syslen;
} Tok;

typedef struct {
    /* input */
    const uint8_t *s; Py_ssize_t n;
    uint8_t *norm;                      /* owned \r-normalized copy or NULL */
    /* pools + arrays */
    Pool text;                          /* node text/comment/doctype bytes */
    Pool ab;                            /* attr name/value bytes */
    Pool tokp;                          /* per-token name/attr staging */
    Pool chp;                           /* per-token chars staging */
    Pool ttext_buf;                     /* pending table character tokens */
    int ttext_active;
    CAttr *attrs; int nattrs, attrcap;
    CNode *nodes; int nnodes, nodecap;
    int *open; int nopen, opencap;
    uint8_t *pscope;                    /* [i]: p in button scope at depth i
                                         * (parallel to open; cap=opencap) */
    int *afe; int nafe, afecap;         /* node idx or -1 (marker) */
    /* tree state */
    int mode, original_mode;
    int tmodes[MAX_TMODES]; int ntmodes;  /* template insertion modes */
    int head_ptr, form_ptr;             /* node idx or -1 */
    int frameset_ok, ignore_next_lf, scripting, saw_foreign, stopped;
    int foster, quirks, bail;
    /* tokenizer state */
    int tstate;
    Py_ssize_t pos;
    uint8_t last_start[64]; int last_start_len;
    int pending_eof;                    /* emit EOF on next pull */
    Tok pending;                        /* one-token lookahead queue */
    int has_pending;
} Parser;

/* ------------------------------------------------------------------ pools */

static int pool_reserve(Pool *p, size_t extra) {
    if (p->len + extra <= p->cap) return 0;
    size_t nc = p->cap ? p->cap * 2 : 4096;
    while (nc < p->len + extra) nc *= 2;
    uint8_t *nb = (uint8_t *)realloc(p->buf, nc);
    if (!nb) return -1;
    p->buf = nb; p->cap = nc;
    return 0;
}

static int pool_put(Pool *p, const uint8_t *d, size_t len, uint32_t *off) {
    if (pool_reserve(p, len) < 0) return -1;
    if (off) *off = (uint32_t)p->len;
    if (len) memcpy(p->buf + p->len, d, len);
    p->len += len;
    return 0;
}

static int pool_putc(Pool *p, uint8_t c) {
    if (pool_reserve(p, 1) < 0) return -1;
    p->buf[p->len++] = c;
    return 0;
}

/* ------------------------------------------------------------- char tests */

static inline int is_ws(uint8_t c) {
    return c == ' ' || c == '\t' || c == '\n' || c == 0x0c || c == '\r';
}
static inline int is_alpha(uint8_t c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
static inline int is_digit(uint8_t c) { return c >= '0' && c <= '9'; }
static inline int is_alnum(uint8_t c) { return is_alpha(c) || is_digit(c); }
static inline int is_hex(uint8_t c) {
    return is_digit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F');
}
static inline uint8_t lo(uint8_t c) {
    return (c >= 'A' && c <= 'Z') ? (uint8_t)(c + 32) : c;
}

/* ascii-caseless compare of (p,len) vs NUL-terminated lowercase lit */
static int eq_lit_ci(const uint8_t *p, Py_ssize_t len, const char *lit) {
    Py_ssize_t i;
    for (i = 0; i < len; i++) {
        if (!lit[i] || lo(p[i]) != (uint8_t)lit[i]) return 0;
    }
    return lit[len] == 0;
}

/* lookup a lowercased name in the sorted TAG_NAMES table */
/* Open-addressing hash over the static tag list (load factor ~0.37),
 * built once at module init: the former bsearch cost ~8 strlen+memcmp
 * probes per lookup and tag_lookup runs ~82x per document — it was the
 * single hottest function in the extraction profile (14.9%). */
#define TAG_HASH_SIZE 512            /* power of two > 2*N_TAGS */
static int16_t TAG_HASH[TAG_HASH_SIZE];
static uint8_t TAG_LEN[N_TAGS];

static inline uint32_t tag_hash_fn(const uint8_t *s, Py_ssize_t len) {
    uint32_t h = 2166136261u;                     /* FNV-1a */
    Py_ssize_t i;
    for (i = 0; i < len; i++)
        h = (h ^ s[i]) * 16777619u;
    return h;
}

static void tag_hash_init(void) {
    int i;
    memset(TAG_HASH, 0xFF, sizeof(TAG_HASH));     /* all -1 */
    for (i = 0; i < N_TAGS; i++) {
        size_t tl = strlen(TAG_NAMES[i]);
        uint32_t h = tag_hash_fn((const uint8_t *)TAG_NAMES[i],
                                 (Py_ssize_t)tl) & (TAG_HASH_SIZE - 1);
        TAG_LEN[i] = (uint8_t)tl;
        while (TAG_HASH[h] >= 0) h = (h + 1) & (TAG_HASH_SIZE - 1);
        TAG_HASH[h] = (int16_t)i;
    }
}

static int tag_lookup(const uint8_t *name, Py_ssize_t len) {
    uint32_t h = tag_hash_fn(name, len) & (TAG_HASH_SIZE - 1);
    int16_t idx;
    while ((idx = TAG_HASH[h]) >= 0) {
        if (TAG_LEN[idx] == len
            && memcmp(name, TAG_NAMES[idx], (size_t)len) == 0)
            return idx;
        h = (h + 1) & (TAG_HASH_SIZE - 1);
    }
    return -1;
}

static inline uint16_t tagflags(int tag) {
    return tag >= 0 ? TAG_FLAGS[tag] : 0;
}

/* sorted EntPair bsearch (exact key match on name) */
static const char *entpair_lookup(const EntPair *tab, int n,
                                  const uint8_t *key, Py_ssize_t len) {
    int lo_ = 0, hi = n - 1;
    while (lo_ <= hi) {
        int mid = (lo_ + hi) / 2;
        const char *t = tab[mid].name;
        size_t tl = strlen(t);
        size_t ml = (size_t)len < tl ? (size_t)len : tl;
        int c = memcmp(key, t, ml);
        if (c == 0) c = (size_t)len < tl ? -1 : ((size_t)len > tl ? 1 : 0);
        if (c == 0) return tab[mid].val;
        if (c < 0) hi = mid - 1; else lo_ = mid + 1;
    }
    return NULL;
}

/* ------------------------------------------------------------- node arena */

static int node_new(Parser *P, int kind) {
    if (P->nnodes >= P->nodecap) {
        int nc = P->nodecap ? P->nodecap * 2 : 256;
        CNode *nn = (CNode *)realloc(P->nodes, nc * sizeof(CNode));
        if (!nn) { P->bail = 1; return 0; }
        P->nodes = nn; P->nodecap = nc;
    }
    CNode *nd = &P->nodes[P->nnodes];
    memset(nd, 0, sizeof(*nd));
    nd->kind = (uint8_t)kind;
    nd->tag = -1;
    nd->parent = nd->first_child = nd->last_child = -1;
    nd->prev_sib = nd->next_sib = -1;
    nd->attr_start = -1;
    return P->nnodes++;
}

#define ND(P, i) (&(P)->nodes[i])

static void detach(Parser *P, int c) {
    CNode *cn = ND(P, c);
    if (cn->parent < 0) return;
    CNode *pn = ND(P, cn->parent);
    if (cn->prev_sib >= 0) ND(P, cn->prev_sib)->next_sib = cn->next_sib;
    else pn->first_child = cn->next_sib;
    if (cn->next_sib >= 0) ND(P, cn->next_sib)->prev_sib = cn->prev_sib;
    else pn->last_child = cn->prev_sib;
    cn->parent = cn->prev_sib = cn->next_sib = -1;
}

static void append_child(Parser *P, int p, int c) {
    detach(P, c);
    CNode *pn = ND(P, p), *cn = ND(P, c);
    cn->parent = p;
    cn->prev_sib = pn->last_child;
    cn->next_sib = -1;
    if (pn->last_child >= 0) ND(P, pn->last_child)->next_sib = c;
    else pn->first_child = c;
    pn->last_child = c;
}

/* insert c into p before node `before` (before=-1 -> append) */
static void insert_before(Parser *P, int p, int c, int before) {
    if (before < 0) { append_child(P, p, c); return; }
    detach(P, c);
    CNode *pn = ND(P, p), *cn = ND(P, c), *bn = ND(P, before);
    cn->parent = p;
    cn->next_sib = before;
    cn->prev_sib = bn->prev_sib;
    if (bn->prev_sib >= 0) ND(P, bn->prev_sib)->next_sib = c;
    else pn->first_child = c;
    bn->prev_sib = c;
}

/* ------------------------------------------------------------- attributes */

static int attrs_reserve(Parser *P, int extra) {
    if (P->nattrs + extra <= P->attrcap) return 0;
    int nc = P->attrcap ? P->attrcap * 2 : 256;
    while (nc < P->nattrs + extra) nc *= 2;
    CAttr *na = (CAttr *)realloc(P->attrs, nc * sizeof(CAttr));
    if (!na) { P->bail = 1; return -1; }
    P->attrs = na; P->attrcap = nc;
    return 0;
}

/* find attr by (lowercase, NUL-terminated) literal name; returns idx into
 * P->attrs or -1 */
static int node_attr_find(Parser *P, int el, const char *name) {
    CNode *nd = ND(P, el);
    size_t nl = strlen(name);
    int i;
    for (i = 0; i < nd->attr_count; i++) {
        CAttr *a = &P->attrs[nd->attr_start + i];
        if (a->nlen == nl && memcmp(P->ab.buf + a->noff, name, nl) == 0)
            return nd->attr_start + i;
    }
    return -1;
}

/* token attr find by literal name (token names already lowercased) */
static int tok_attr_find(Tok *t, const char *name) {
    size_t nl = strlen(name);
    int i;
    for (i = 0; i < t->nattrs; i++) {
        if ((size_t)t->a[i].nl == nl && memcmp(t->a[i].n, name, nl) == 0)
            return i;
    }
    return -1;
}

/* dict-equality of two nodes' attrs (unordered; names unique) */
static int attrs_equal(Parser *P, int a, int b) {
    CNode *an = ND(P, a), *bn = ND(P, b);
    if (an->attr_count != bn->attr_count) return 0;
    int i, j;
    for (i = 0; i < an->attr_count; i++) {
        CAttr *x = &P->attrs[an->attr_start + i];
        int hit = 0;
        for (j = 0; j < bn->attr_count; j++) {
            CAttr *y = &P->attrs[bn->attr_start + j];
            if (x->nlen == y->nlen && x->vlen == y->vlen
                && memcmp(P->ab.buf + x->noff, P->ab.buf + y->noff, x->nlen) == 0
                && memcmp(P->ab.buf + x->voff, P->ab.buf + y->voff, x->vlen) == 0) {
                hit = 1; break;
            }
        }
        if (!hit) return 0;
    }
    return 1;
}

/* ------------------------------------------------------- UTF-8 / entities */

static int utf8_encode(uint32_t cp, uint8_t out[4]) {
    if (cp < 0x80) { out[0] = (uint8_t)cp; return 1; }
    if (cp < 0x800) {
        out[0] = 0xC0 | (cp >> 6); out[1] = 0x80 | (cp & 0x3F); return 2;
    }
    if (cp < 0x10000) {
        out[0] = 0xE0 | (cp >> 12); out[1] = 0x80 | ((cp >> 6) & 0x3F);
        out[2] = 0x80 | (cp & 0x3F); return 3;
    }
    out[0] = 0xF0 | (cp >> 18); out[1] = 0x80 | ((cp >> 12) & 0x3F);
    out[2] = 0x80 | ((cp >> 6) & 0x3F); out[3] = 0x80 | (cp & 0x3F);
    return 4;
}

static const uint8_t FFFD[3] = {0xEF, 0xBF, 0xBD};

/* consume a character reference at s[pos]=='&' (entities.py port, errors
 * dropped). Appends the decoded bytes to `out` and returns the new pos;
 * appends a literal '&' and returns pos+1 when nothing decodes. */
static Py_ssize_t consume_charref(Parser *P, Pool *out, Py_ssize_t pos,
                                  int in_attribute, uint8_t additional) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    Py_ssize_t i = pos + 1;
    if (i >= n) goto literal;
    uint8_t c = s[i];
    if (c == '\t' || c == '\n' || c == 0x0c || c == ' ' || c == '<'
        || c == '&' || (additional && c == additional))
        goto literal;
    if (c == '#') {
        Py_ssize_t j = i + 1;
        int hex = 0;
        if (j < n && (s[j] == 'x' || s[j] == 'X')) { hex = 1; j++; }
        Py_ssize_t k = j;
        uint64_t cp = 0;
        while (k < n && (hex ? is_hex(s[k]) : is_digit(s[k]))) {
            if (cp <= 0x110000) {
                uint8_t d = s[k];
                uint32_t v = is_digit(d) ? d - '0'
                    : (d >= 'a' ? d - 'a' + 10 : d - 'A' + 10);
                cp = cp * (hex ? 16 : 10) + v;
            }
            k++;
        }
        if (k == j) goto literal;  /* no digits */
        if (k < n && s[k] == ';') k++;
        /* win1252 overrides, then surrogate/out-of-range -> U+FFFD */
        {
            int w;
            for (w = 0; w < N_WIN1252; w++) {
                if (cp == WIN1252_FROM[w]) { cp = WIN1252_TO[w]; break; }
            }
        }
        if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) {
            if (pool_put(out, FFFD, 3, NULL) < 0) P->bail = 1;
        } else {
            uint8_t b[4]; int bl = utf8_encode((uint32_t)cp, b);
            if (pool_put(out, b, bl, NULL) < 0) P->bail = 1;
        }
        return k;
    }
    /* named */
    {
        Py_ssize_t r = i;
        while (r < n && is_alnum(s[r])) r++;
        Py_ssize_t runlen = r - i;
        if (runlen == 0) goto literal;
        if (r < n && s[r] == ';') {
            const char *val = entpair_lookup(ENT_EXACT, N_ENT_EXACT, s + i,
                                             runlen);
            if (val) {
                if (pool_put(out, (const uint8_t *)val, strlen(val), NULL) < 0)
                    P->bail = 1;
                return r + 1;
            }
        }
        Py_ssize_t L = runlen < MAX_ENT_BARE_LEN ? runlen : MAX_ENT_BARE_LEN;
        for (; L >= 1; L--) {
            const char *val = entpair_lookup(ENT_BARE, N_ENT_BARE, s + i, L);
            if (!val) continue;
            Py_ssize_t end = i + L;
            if (in_attribute
                && (L < runlen || (end < n && s[end] == '=')))
                goto literal;
            if (pool_put(out, (const uint8_t *)val, strlen(val), NULL) < 0)
                P->bail = 1;
            return end;
        }
    }
literal:
    if (pool_putc(out, '&') < 0) P->bail = 1;
    return pos + 1;
}

/* ============================================================= tokenizer */
/* One token per next_token() call, mirroring tokenizer.py's generator —
 * identical token boundaries (this matters: per-token chunking decides
 * table-mode foster-parenting semantics). Token payloads point into
 * P->tokp / P->chp, which are pre-reserved at 3n+64 bytes so they never
 * reallocate mid-token (worst case: every input byte becomes U+FFFD). */

/* append [p,len) replacing \0 with U+FFFD */
static void put_repl(Parser *P, Pool *out, const uint8_t *p, Py_ssize_t len) {
    Py_ssize_t i = 0;
    while (i < len) {
        const uint8_t *z = memchr(p + i, 0, len - i);
        if (!z) {
            if (pool_put(out, p + i, len - i, NULL) < 0) P->bail = 1;
            return;
        }
        Py_ssize_t k = z - p;
        if (pool_put(out, p + i, k - i, NULL) < 0) P->bail = 1;
        if (pool_put(out, FFFD, 3, NULL) < 0) P->bail = 1;
        i = k + 1;
    }
}

/* append lowercased name with \0 -> U+FFFD */
static void put_name(Parser *P, Pool *out, const uint8_t *p, Py_ssize_t len) {
    Py_ssize_t i;
    for (i = 0; i < len; i++) {
        uint8_t c = p[i];
        if (c == 0) {
            if (pool_put(out, FFFD, 3, NULL) < 0) P->bail = 1;
        } else {
            if (pool_putc(out, lo(c)) < 0) P->bail = 1;
        }
    }
}

static void set_chars(Tok *t, Parser *P) {
    t->kind = TK_CHARS;
    t->data = P->chp.buf;
    t->dlen = (Py_ssize_t)P->chp.len;
}

static void set_chars_lit(Tok *t, const char *lit) {
    t->kind = TK_CHARS;
    t->data = (const uint8_t *)lit;
    t->dlen = (Py_ssize_t)strlen(lit);
}

static void queue_eof(Parser *P) { P->pending_eof = 1; }

static void next_token(Parser *P, Tok *t);

/* ---- tag + attribute consumption (tokenizer.py _consume_tag) ---- */

static Py_ssize_t consume_attribute(Parser *P, Py_ssize_t pos, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    uint32_t noff = (uint32_t)P->tokp.len;
    uint8_t c = s[pos];
    if (c == '=') {
        /* '=' begins the name per spec */
        if (pool_putc(&P->tokp, '=') < 0) P->bail = 1;
        Py_ssize_t st = pos + 1;
        while (st < n) {
            uint8_t d = s[st];
            if (is_ws(d) || d == '/' || d == '=' || d == '>') break;
            st++;
        }
        put_name(P, &P->tokp, s + pos + 1, st - (pos + 1));
        pos = st;
    } else {
        Py_ssize_t st = pos;
        while (st < n) {
            uint8_t d = s[st];
            if (is_ws(d) || d == '/' || d == '=' || d == '>') break;
            st++;
        }
        if (st == pos) return pos + 1;  /* defensive (matches Python) */
        put_name(P, &P->tokp, s + pos, st - pos);
        pos = st;
    }
    uint32_t nlen = (uint32_t)P->tokp.len - noff;
    while (pos < n && is_ws(s[pos])) pos++;
    if (pos >= n) return -1;
    uint32_t voff = (uint32_t)P->tokp.len, vlen = 0;
    if (s[pos] == '=') {
        pos++;
        while (pos < n && is_ws(s[pos])) pos++;
        if (pos >= n) return -1;
        uint8_t q = s[pos];
        if (q == '"' || q == '\'') {
            Py_ssize_t qi_cache = -1;   /* closing quote; -1 = unknown */
            pos++;
            for (;;) {
                if (pos >= n) return -1;
                if (qi_cache < pos) {
                    const uint8_t *qp = memchr(s + pos, q, n - pos);
                    qi_cache = qp ? qp - s : n;
                }
                Py_ssize_t qi = qi_cache < n ? qi_cache : -1;
                /* '&' bounded by the closing quote (a charref never spans
                 * it: entity chars exclude quotes), quote scan cached
                 * across charref iterations — either unbounded/recomputed
                 * form is O(n^2) on long values */
                const uint8_t *ap = memchr(
                    s + pos, '&', (qi != -1 ? qi : n) - pos);
                if (ap) {
                    put_repl(P, &P->tokp, s + pos, (ap - s) - pos);
                    pos = consume_charref(P, &P->tokp, ap - s, 1, q);
                    continue;
                }
                if (qi == -1) return -1;
                put_repl(P, &P->tokp, s + pos, qi - pos);
                pos = qi + 1;
                break;
            }
            /* missing-whitespace-between-attributes: error only */
        } else if (q == '>') {
            /* missing value: leave pos at '>' for caller */
        } else {
            for (;;) {
                if (pos >= n) {  /* EOF terminates the tag */
                    vlen = (uint32_t)P->tokp.len - voff;
                    goto store_eof;
                }
                uint8_t d = s[pos];
                if (d == '\t' || d == '\n' || d == 0x0c || d == ' '
                    || d == '>') break;
                if (d == '&') {
                    pos = consume_charref(P, &P->tokp, pos, 1, '>');
                    continue;
                }
                if (d == 0) {
                    if (pool_put(&P->tokp, FFFD, 3, NULL) < 0) P->bail = 1;
                    pos++;
                    continue;
                }
                Py_ssize_t r = pos;
                while (r < n) {
                    uint8_t e = s[r];
                    if (e == '\t' || e == '\n' || e == 0x0c || e == ' '
                        || e == '>' || e == '&' || e == 0) break;
                    r++;
                }
                if (pool_put(&P->tokp, s + pos, r - pos, NULL) < 0) P->bail = 1;
                pos = r;
            }
        }
    }
    vlen = (uint32_t)P->tokp.len - voff;
    goto store;
store_eof:
    /* fallthrough store then signal EOF via -1 after dup check is moot:
     * Python discards the tag entirely on EOF, so just return -1 */
    return -1;
store:
    {
        /* duplicate names: first wins */
        int i, dup = 0;
        for (i = 0; i < t->nattrs; i++) {
            if ((uint32_t)t->a[i].nl == nlen
                && memcmp(t->a[i].n, P->tokp.buf + noff, nlen) == 0) {
                dup = 1; break;
            }
        }
        if (!dup) {
            if (t->nattrs >= MAX_TOK_ATTRS) { P->bail = 1; return -1; }
            t->a[t->nattrs].n = P->tokp.buf + noff;
            t->a[t->nattrs].nl = nlen;
            t->a[t->nattrs].v = P->tokp.buf + voff;
            t->a[t->nattrs].vl = vlen;
            t->nattrs++;
        }
    }
    return pos;
}

static void consume_tag(Parser *P, Py_ssize_t name_start, int is_end, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    P->tokp.len = 0;
    Py_ssize_t st = name_start;
    while (st < n) {
        uint8_t d = s[st];
        if (is_ws(d) || d == '/' || d == '>') break;
        st++;
    }
    uint32_t noff = (uint32_t)P->tokp.len;
    put_name(P, &P->tokp, s + name_start, st - name_start);
    uint32_t nlen = (uint32_t)P->tokp.len - noff;
    Py_ssize_t pos = st;
    t->nattrs = 0;
    t->self_closing = 0;
    for (;;) {
        if (pos >= n) { t->kind = TK_EOF; P->pos = n; return; }
        uint8_t c = s[pos];
        if (is_ws(c)) { pos++; continue; }
        if (c == '/') {
            if (pos + 1 < n && s[pos + 1] == '>') {
                t->self_closing = 1; pos += 2; break;
            }
            pos++; continue;
        }
        if (c == '>') { pos++; break; }
        pos = consume_attribute(P, pos, t);
        if (pos < 0) { t->kind = TK_EOF; P->pos = n; return; }
        if (P->bail) { t->kind = TK_EOF; P->pos = n; return; }
    }
    P->pos = pos;
    t->name = P->tokp.buf + noff;
    t->nlen = nlen;
    t->tag = tag_lookup(t->name, t->nlen);
    if (is_end) {
        t->kind = TK_END;
        t->nattrs = 0;
        t->self_closing = 0;
    } else {
        t->kind = TK_START;
        if (nlen < sizeof(P->last_start)) {
            memcpy(P->last_start, t->name, nlen);
            P->last_start_len = (int)nlen;
        } else {
            P->last_start_len = 0;  /* absurd tag name: never "appropriate" */
        }
    }
}

/* ---- comments / doctype / cdata ---- */

static void bogus_comment(Parser *P, Py_ssize_t pos, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    const uint8_t *gtp = memchr(s + pos, '>', n - pos);
    Py_ssize_t end = gtp ? gtp - s : n;
    P->chp.len = 0;
    put_repl(P, &P->chp, s + pos, end - pos);
    P->pos = gtp ? end + 1 : n;
    t->kind = TK_COMMENT;
    t->data = P->chp.buf;
    t->dlen = (Py_ssize_t)P->chp.len;
}

static void put_dashes(Parser *P, Py_ssize_t k) {
    while (k-- > 0) {
        if (pool_putc(&P->chp, '-') < 0) P->bail = 1;
    }
}

static void comment_token(Parser *P, Py_ssize_t pos, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    P->chp.len = 0;
    t->kind = TK_COMMENT;
    if (pos < n && s[pos] == '>') {
        P->pos = pos + 1; t->data = P->chp.buf; t->dlen = 0; return;
    }
    if (pos + 1 < n && s[pos] == '-' && s[pos + 1] == '>') {
        P->pos = pos + 2; t->data = P->chp.buf; t->dlen = 0; return;
    }
    for (;;) {
        if (pos >= n) { queue_eof(P); break; }
        const uint8_t *dp = memchr(s + pos, '-', n - pos);
        if (!dp) {
            put_repl(P, &P->chp, s + pos, n - pos);
            pos = n; queue_eof(P); break;
        }
        Py_ssize_t dash = dp - s;
        put_repl(P, &P->chp, s + pos, dash - pos);
        Py_ssize_t run_end = dash;
        while (run_end < n && s[run_end] == '-') run_end++;
        Py_ssize_t run = run_end - dash;
        if (run_end >= n) {
            put_dashes(P, run - 2 > 0 ? run - 2 : 0);
            pos = n; queue_eof(P); break;
        }
        uint8_t nxt = s[run_end];
        if (run >= 2 && nxt == '>') {
            put_dashes(P, run - 2);
            pos = run_end + 1;
            break;
        }
        if (run >= 2 && nxt == '!') {
            if (run_end + 1 < n && s[run_end + 1] == '>') {
                put_dashes(P, run - 2);
                pos = run_end + 2;
                break;
            }
            if (run_end + 1 >= n) {
                put_dashes(P, run - 2);
                pos = n; queue_eof(P); break;
            }
            put_dashes(P, run - 2);
            if (pool_put(&P->chp, (const uint8_t *)"--!", 3, NULL) < 0)
                P->bail = 1;
            pos = run_end + 1;
            continue;
        }
        put_dashes(P, run);
        pos = run_end;
    }
    P->pos = pos;
    t->data = P->chp.buf;
    t->dlen = (Py_ssize_t)P->chp.len;
}

/* doctype quoted-identifier helper (tokenizer.py `quoted`): returns text in
 * tokp [*off,*len); sets *aborted when '>' cut it short (caller emits the
 * token at the returned pos with force_quirks), *eof at EOF. */
static Py_ssize_t dt_quoted(Parser *P, Py_ssize_t p, uint32_t *off,
                            uint32_t *len, int *eof, int *aborted) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    uint8_t q = s[p];
    const uint8_t *ep = memchr(s + p + 1, q, n - (p + 1));
    const uint8_t *gp = memchr(s + p + 1, '>', n - (p + 1));
    Py_ssize_t endq = ep ? ep - s : -1;
    Py_ssize_t gt = gp ? gp - s : -1;
    *eof = 0; *aborted = 0;
    *off = (uint32_t)P->tokp.len;
    if (gt != -1 && (endq == -1 || gt < endq)) {
        put_repl(P, &P->tokp, s + p + 1, gt - (p + 1));
        *len = (uint32_t)P->tokp.len - *off;
        *aborted = 1;
        return gt + 1;
    }
    if (endq == -1) {
        put_repl(P, &P->tokp, s + p + 1, n - (p + 1));
        *len = (uint32_t)P->tokp.len - *off;
        *eof = 1;
        return n;
    }
    put_repl(P, &P->tokp, s + p + 1, endq - (p + 1));
    *len = (uint32_t)P->tokp.len - *off;
    return endq + 1;
}

static Py_ssize_t dt_bogus(Parser *P, Py_ssize_t pos, int *eof) {
    const uint8_t *gp = memchr(P->s + pos, '>', P->n - pos);
    if (!gp) { *eof = 1; return P->n; }
    *eof = 0;
    return (gp - P->s) + 1;
}

static void doctype_token(Parser *P, Py_ssize_t pos, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    P->tokp.len = 0;
    t->kind = TK_DOCTYPE;
    t->has_name = t->has_public = t->has_system = 0;
    t->force_quirks = 0;
    t->name = NULL; t->nlen = 0;
    t->pub = NULL; t->publen = 0;
    t->sys = NULL; t->syslen = 0;
    while (pos < n && is_ws(s[pos])) pos++;
    if (pos >= n) {
        t->force_quirks = 1; P->pos = n; queue_eof(P); return;
    }
    if (s[pos] == '>') {
        t->force_quirks = 1; P->pos = pos + 1; return;
    }
    /* name */
    {
        Py_ssize_t st = pos;
        while (pos < n && !is_ws(s[pos]) && s[pos] != '>') pos++;
        uint32_t noff = (uint32_t)P->tokp.len;
        put_name(P, &P->tokp, s + st, pos - st);
        t->name = P->tokp.buf + noff;
        t->nlen = (Py_ssize_t)((uint32_t)P->tokp.len - noff);
        t->has_name = 1;
    }
    if (pos >= n) {
        t->force_quirks = 1; P->pos = n; queue_eof(P); return;
    }
    while (pos < n && is_ws(s[pos])) pos++;
    if (pos < n && s[pos] == '>') { P->pos = pos + 1; return; }
    if (pos >= n) {
        t->force_quirks = 1; P->pos = n; queue_eof(P); return;
    }
    {
        int is_public = (pos + 6 <= n && eq_lit_ci(s + pos, 6, "public"));
        int is_system = !is_public
            && (pos + 6 <= n && eq_lit_ci(s + pos, 6, "system"));
        int eof = 0;
        if (!is_public && !is_system) {
            t->force_quirks = 1;
            pos = dt_bogus(P, pos, &eof);
            if (eof) { P->pos = n; queue_eof(P); return; }
            P->pos = pos; return;
        }
        pos += 6;
        /* _doctype_ids port */
        if (is_public) {
            while (pos < n && is_ws(s[pos])) pos++;
            if (pos >= n) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
            if (s[pos] == '>') { t->force_quirks = 1; P->pos = pos + 1; return; }
            if (s[pos] != '"' && s[pos] != '\'') {
                t->force_quirks = 1;
                pos = dt_bogus(P, pos, &eof);
                if (eof) { P->pos = n; queue_eof(P); return; }
                P->pos = pos; return;
            }
            {
                uint32_t off, len; int aborted;
                pos = dt_quoted(P, pos, &off, &len, &eof, &aborted);
                t->pub = P->tokp.buf + off; t->publen = len; t->has_public = 1;
                if (eof) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
                if (aborted) { t->force_quirks = 1; P->pos = pos; return; }
            }
            {
                Py_ssize_t pos2 = pos;
                while (pos2 < n && is_ws(s[pos2])) pos2++;
                if (pos2 >= n) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
                if (s[pos2] == '>') { P->pos = pos2 + 1; return; }
                if (s[pos2] == '"' || s[pos2] == '\'') {
                    uint32_t off, len; int aborted;
                    Py_ssize_t pos3 = dt_quoted(P, pos2, &off, &len, &eof,
                                                &aborted);
                    t->sys = P->tokp.buf + off; t->syslen = len;
                    t->has_system = 1;
                    if (eof) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
                    if (aborted) { t->force_quirks = 1; P->pos = pos3; return; }
                    while (pos3 < n && is_ws(s[pos3])) pos3++;
                    if (pos3 >= n) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
                    if (s[pos3] == '>') { P->pos = pos3 + 1; return; }
                    pos3 = dt_bogus(P, pos3, &eof);
                    if (eof) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
                    P->pos = pos3; return;
                }
                t->force_quirks = 1;
                pos2 = dt_bogus(P, pos2, &eof);
                if (eof) { P->pos = n; queue_eof(P); return; }
                P->pos = pos2; return;
            }
        } else {
            while (pos < n && is_ws(s[pos])) pos++;
            if (pos >= n) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
            if (s[pos] == '>') { t->force_quirks = 1; P->pos = pos + 1; return; }
            if (s[pos] != '"' && s[pos] != '\'') {
                t->force_quirks = 1;
                pos = dt_bogus(P, pos, &eof);
                if (eof) { P->pos = n; queue_eof(P); return; }
                P->pos = pos; return;
            }
            {
                uint32_t off, len; int aborted;
                pos = dt_quoted(P, pos, &off, &len, &eof, &aborted);
                t->sys = P->tokp.buf + off; t->syslen = len; t->has_system = 1;
                if (eof) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
                if (aborted) { t->force_quirks = 1; P->pos = pos; return; }
            }
            while (pos < n && is_ws(s[pos])) pos++;
            if (pos >= n) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
            if (s[pos] == '>') { P->pos = pos + 1; return; }
            pos = dt_bogus(P, pos, &eof);
            if (eof) { t->force_quirks = 1; P->pos = n; queue_eof(P); return; }
            P->pos = pos; return;
        }
    }
}

static void cdata_token(Parser *P, Py_ssize_t pos, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    Py_ssize_t end = -1;
    {
        Py_ssize_t i = pos;
        while (i + 2 < n + 1) {
            const uint8_t *bp = memchr(s + i, ']', n - i);
            if (!bp) break;
            Py_ssize_t b = bp - s;
            if (b + 2 < n && s[b + 1] == ']' && s[b + 2] == '>') { end = b; break; }
            i = b + 1;
        }
    }
    if (end == -1) {
        P->pos = n;
        if (n - pos > 0) {
            /* data emitted as-is (data-state NUL semantics) */
            t->kind = TK_CHARS; t->data = s + pos; t->dlen = n - pos;
            queue_eof(P);
        } else {
            t->kind = TK_EOF;
        }
        return;
    }
    P->pos = end + 3;
    if (end - pos > 0) {
        t->kind = TK_CHARS; t->data = s + pos; t->dlen = end - pos;
    } else {
        next_token(P, t);  /* empty cdata: no token */
    }
}

static void tag_open(Parser *P, Py_ssize_t pos, Tok *t);

static void markup_declaration_open(Parser *P, Py_ssize_t pos, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    if (pos + 1 < n && s[pos] == '-' && s[pos + 1] == '-') {
        comment_token(P, pos + 2, t);
        return;
    }
    if (pos + 7 <= n && eq_lit_ci(s + pos, 7, "doctype")) {
        doctype_token(P, pos + 7, t);
        return;
    }
    if (pos + 7 <= n && memcmp(s + pos, "[CDATA[", 7) == 0) {
        int foreign = 0;
        if (P->saw_foreign && P->nopen > 0)
            foreign = ND(P, P->open[P->nopen - 1])->ns != NS_HTML;
        if (foreign) { cdata_token(P, pos + 7, t); return; }
        bogus_comment(P, pos, t);
        return;
    }
    bogus_comment(P, pos, t);
}

static void tag_open(Parser *P, Py_ssize_t pos, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    Py_ssize_t i = pos + 1;
    if (i >= n) {
        P->pos = n; set_chars_lit(t, "<"); queue_eof(P); return;
    }
    uint8_t c = s[i];
    if (c == '!') { markup_declaration_open(P, i + 1, t); return; }
    if (c == '/') {
        Py_ssize_t j = i + 1;
        if (j >= n) {
            P->pos = n; set_chars_lit(t, "</"); queue_eof(P); return;
        }
        uint8_t cj = s[j];
        if (is_alpha(cj)) { consume_tag(P, j, 1, t); return; }
        if (cj == '>') { P->pos = j + 1; next_token(P, t); return; }
        bogus_comment(P, j, t);
        return;
    }
    if (is_alpha(c)) { consume_tag(P, i, 0, t); return; }
    if (c == '?') { bogus_comment(P, i, t); return; }
    P->pos = i;
    set_chars_lit(t, "<");
}

/* data state: one token (chars run incl. decoded entities, or dispatch) */
static void data_token(Parser *P, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    Py_ssize_t pos = P->pos;
    Py_ssize_t lt_cache = -1;   /* first '<' at/after pos; -1 = unknown */
    if (pos >= n) { t->kind = TK_EOF; return; }
    P->chp.len = 0;
    while (pos < n) {
        uint8_t c = s[pos];
        if (c == '<') {
            if (P->chp.len) { P->pos = pos; set_chars(t, P); return; }
            tag_open(P, pos, t);
            return;
        }
        if (c == '&') {
            pos = consume_charref(P, &P->chp, pos, 0, 0);
            continue;
        }
        /* bulk run to next '<' or '&' (NULs pass through in data state).
         * The '&' search is BOUNDED by the next '<', and the '<' scan is
         * CACHED across charref iterations (charrefs never contain '<'):
         * either unbounded/recomputed form rescans the remaining text
         * per token — O(n^2) on amp-free or entity-dense documents. */
        {
            if (lt_cache < pos) {
                const uint8_t *lp = memchr(s + pos, '<', n - pos);
                lt_cache = lp ? lp - s : n;
            }
            Py_ssize_t end = lt_cache;
            const uint8_t *ap = memchr(s + pos, '&', end - pos);
            if (ap) end = ap - s;
            if (pool_put(&P->chp, s + pos, end - pos, NULL) < 0) P->bail = 1;
            pos = end;
        }
    }
    P->pos = n;
    if (P->chp.len) { set_chars(t, P); return; }
    t->kind = TK_EOF;
}

static int appropriate_end_tag_at(Parser *P, Py_ssize_t lt) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    int L = P->last_start_len;
    if (L == 0) return 0;
    Py_ssize_t i = lt + 1;
    if (i >= n || s[i] != '/') return 0;
    Py_ssize_t j = i + 1, end = j + L;
    if (end >= n) return 0;   /* spec-port: name must be followed by a char */
    Py_ssize_t k;
    for (k = 0; k < L; k++) {
        if (lo(s[j + k]) != P->last_start[k]) return 0;
    }
    uint8_t a = s[end];
    return a == '\t' || a == '\n' || a == 0x0c || a == ' ' || a == '/'
        || a == '>';
}

/* RCDATA / RAWTEXT: one chars token up to an appropriate end tag */
static void rawtext_like_token(Parser *P, int char_refs, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    Py_ssize_t pos = P->pos;
    if (pos >= n) { t->kind = TK_EOF; return; }
    P->chp.len = 0;
    Py_ssize_t lt_cache = -1;   /* first '<' at/after pos; -1 = unknown */
    while (pos < n) {
        if (lt_cache < pos) {
            const uint8_t *lp = memchr(s + pos, '<', n - pos);
            lt_cache = lp ? lp - s : n;
        }
        Py_ssize_t lt = lt_cache < n ? lt_cache : -1;
        Py_ssize_t stop = lt != -1 ? lt : n;
        if (char_refs) {
            /* bounded by stop + '<' scan cached across charref
             * iterations: see data_token's O(n^2) note */
            const uint8_t *ap = memchr(s + pos, '&', stop - pos);
            if (ap) {
                put_repl(P, &P->chp, s + pos, (ap - s) - pos);
                pos = consume_charref(P, &P->chp, ap - s, 0, 0);
                continue;
            }
        }
        put_repl(P, &P->chp, s + pos, stop - pos);
        pos = stop;
        if (lt == -1) break;
        if (appropriate_end_tag_at(P, lt)) {
            if (P->chp.len) { P->pos = lt; set_chars(t, P); return; }
            P->tstate = S_DATA;
            consume_tag(P, lt + 2, 1, t);
            return;
        }
        if (pool_putc(&P->chp, '<') < 0) P->bail = 1;
        pos = lt + 1;
    }
    P->pos = pos;
    if (P->chp.len) { set_chars(t, P); return; }
    t->kind = TK_EOF;
}

static void plaintext_token(Parser *P, Tok *t) {
    Py_ssize_t pos = P->pos;
    if (pos >= P->n) { t->kind = TK_EOF; return; }
    P->chp.len = 0;
    put_repl(P, &P->chp, P->s + pos, P->n - pos);
    P->pos = P->n;
    set_chars(t, P);
}

/* script data incl. escaped / double-escaped states */
static void script_token(Parser *P, Tok *t) {
    const uint8_t *s = P->s; Py_ssize_t n = P->n;
    Py_ssize_t pos = P->pos;
    if (pos >= n) { t->kind = TK_EOF; return; }
    P->chp.len = 0;
    int escaped = 0, double_escaped = 0;
    while (pos < n) {
        uint8_t c = s[pos];
        if (c == '<') {
            if (!escaped) {
                if (appropriate_end_tag_at(P, pos)) {
                    if (P->chp.len) { P->pos = pos; set_chars(t, P); return; }
                    P->tstate = S_DATA;
                    consume_tag(P, pos + 2, 1, t);
                    return;
                }
                if (pos + 3 < n && s[pos + 1] == '!' && s[pos + 2] == '-'
                    && s[pos + 3] == '-') {
                    escaped = 1;
                    if (pool_put(&P->chp, (const uint8_t *)"<!--", 4, NULL) < 0)
                        P->bail = 1;
                    pos += 4;
                    continue;
                }
                if (pool_putc(&P->chp, '<') < 0) P->bail = 1;
                pos++;
                continue;
            }
            if (!double_escaped) {
                if (appropriate_end_tag_at(P, pos)) {
                    if (P->chp.len) { P->pos = pos; set_chars(t, P); return; }
                    P->tstate = S_DATA;
                    consume_tag(P, pos + 2, 1, t);
                    return;
                }
                if (pos + 1 < n && pos + 7 <= n
                    && eq_lit_ci(s + pos + 1, 6, "script")) {
                    Py_ssize_t after = pos + 7;
                    if (after < n && (is_ws(s[after]) || s[after] == '/'
                                      || s[after] == '>')) {
                        double_escaped = 1;
                        put_repl(P, &P->chp, s + pos, after + 1 - pos);
                        pos = after + 1;
                        continue;
                    } else if (after >= n) {
                        put_repl(P, &P->chp, s + pos, n - pos);
                        pos = n;
                        continue;
                    }
                }
                if (pool_putc(&P->chp, '<') < 0) P->bail = 1;
                pos++;
                continue;
            }
            /* double-escaped */
            if (pos + 1 < n && s[pos + 1] == '/' && pos + 8 <= n
                && eq_lit_ci(s + pos + 2, 6, "script")) {
                Py_ssize_t after = pos + 8;
                if (after < n && (is_ws(s[after]) || s[after] == '/'
                                  || s[after] == '>')) {
                    double_escaped = 0;
                    put_repl(P, &P->chp, s + pos, after + 1 - pos);
                    pos = after + 1;
                    continue;
                }
            }
            if (pool_putc(&P->chp, '<') < 0) P->bail = 1;
            pos++;
            continue;
        }
        if (c == '-' && escaped) {
            if (pos + 2 < n && s[pos + 1] == '-' && s[pos + 2] == '>') {
                escaped = 0; double_escaped = 0;
                if (pool_put(&P->chp, (const uint8_t *)"-->", 3, NULL) < 0)
                    P->bail = 1;
                pos += 3;
                continue;
            }
            if (pool_putc(&P->chp, '-') < 0) P->bail = 1;
            pos++;
            continue;
        }
        /* bulk to next interesting char */
        {
            const uint8_t *lp = memchr(s + pos, '<', n - pos);
            Py_ssize_t interesting = lp ? lp - s : n;
            if (escaped) {
                /* bounded by the next '<': see data_token's O(n^2) note */
                const uint8_t *dp = memchr(s + pos, '-',
                                           interesting - pos);
                if (dp) interesting = dp - s;
            }
            if (interesting == pos) {
                put_repl(P, &P->chp, s + pos, 1);
                pos++;
            } else {
                put_repl(P, &P->chp, s + pos, interesting - pos);
                pos = interesting;
            }
        }
    }
    P->pos = pos;
    if (P->chp.len) { set_chars(t, P); return; }
    t->kind = TK_EOF;
}

static void next_token(Parser *P, Tok *t) {
    if (P->has_pending) {
        *t = P->pending;
        P->has_pending = 0;
        return;
    }
    if (P->pending_eof) { t->kind = TK_EOF; return; }
    switch (P->tstate) {
    case S_DATA: data_token(P, t); break;
    case S_RCDATA: rawtext_like_token(P, 1, t); break;
    case S_RAWTEXT: rawtext_like_token(P, 0, t); break;
    case S_SCRIPT: script_token(P, t); break;
    default: plaintext_token(P, t); break;
    }
    if (t->kind == TK_CHARS && t->dlen == 0) {
        /* never emit empty chars (matches Python) */
        next_token(P, t);
    }
}

/* ====================================================== tree construction */

enum { B_BASE, B_LIST, B_BUTTON };
static int is_barrier(Parser *P, int el, int kind);

/* pscope[i]: would a top-down button-scope walk starting at depth i find
 * a p before a barrier? O(1)-computable at push from pscope[i-1]. */
static uint8_t pscope_val(Parser *P, int el, uint8_t below) {
    CNode *nd = ND(P, el);
    if (nd->ns == NS_HTML && nd->tag == TAG_P) return 1;
    if (is_barrier(P, el, B_BUTTON)) return 0;
    return below;
}

static void pscope_refresh_from(Parser *P, int idx) {
    int i;
    if (idx < 0) idx = 0;
    for (i = idx; i < P->nopen; i++)
        P->pscope[i] = pscope_val(P, P->open[i],
                                  i > 0 ? P->pscope[i - 1] : 0);
}

static void open_push(Parser *P, int el) {
    if (P->nopen >= P->opencap) {
        int nc = P->opencap ? P->opencap * 2 : 64;
        int *no = (int *)realloc(P->open, nc * sizeof(int));
        uint8_t *np = (uint8_t *)realloc(P->pscope, nc);
        if (!no || !np) {
            if (no) P->open = no;
            if (np) P->pscope = np;
            P->bail = 1;
            return;
        }
        P->open = no; P->pscope = np; P->opencap = nc;
    }
    P->open[P->nopen] = el;
    P->pscope[P->nopen] = pscope_val(
        P, el, P->nopen > 0 ? P->pscope[P->nopen - 1] : 0);
    P->nopen++;
}

static int open_index(Parser *P, int el) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--)
        if (P->open[i] == el) return i;
    return -1;
}

static void open_remove_at(Parser *P, int idx) {
    memmove(P->open + idx, P->open + idx + 1,
            (P->nopen - idx - 1) * sizeof(int));
    P->nopen--;
    pscope_refresh_from(P, idx);   /* splices are rare (adoption agency) */
}

static void open_insert_at(Parser *P, int idx, int el) {
    open_push(P, 0);  /* grow */
    if (P->bail) return;
    memmove(P->open + idx + 1, P->open + idx,
            (P->nopen - idx - 1) * sizeof(int));
    P->open[idx] = el;
    pscope_refresh_from(P, idx);
}

static void afe_push_raw(Parser *P, int v) {
    if (P->nafe >= P->afecap) {
        int nc = P->afecap ? P->afecap * 2 : 32;
        int *na = (int *)realloc(P->afe, nc * sizeof(int));
        if (!na) { P->bail = 1; return; }
        P->afe = na; P->afecap = nc;
    }
    P->afe[P->nafe++] = v;
}

static int afe_index(Parser *P, int el) {
    int i;
    for (i = P->nafe - 1; i >= 0; i--)
        if (P->afe[i] == el) return i;
    return -1;
}

static void afe_remove_at(Parser *P, int idx) {
    memmove(P->afe + idx, P->afe + idx + 1,
            (P->nafe - idx - 1) * sizeof(int));
    P->nafe--;
}

static void afe_insert_at(Parser *P, int idx, int el) {
    afe_push_raw(P, 0);
    if (P->bail) return;
    /* clamp like Python list.insert: the adoption agency's bookmark is
     * captured as an index and can point past the end after the inner
     * loop's counter>3 step removed an AFE entry below it (repro:
     * <a><font><font><font><font color><p><a> — 4 non-identical
     * formatting entries between fe and the furthest block). Unclamped,
     * (nafe - idx - 1) goes negative -> huge size_t memmove -> UB, and
     * the clone lands beyond nafe, invisible to afe_index, so the outer
     * loop's second iteration never pops it (nested <a> divergence). */
    if (idx > P->nafe - 1) idx = P->nafe - 1;
    memmove(P->afe + idx + 1, P->afe + idx,
            (P->nafe - idx - 1) * sizeof(int));
    P->afe[idx] = el;
}

static inline int cur(Parser *P) {
    return P->nopen ? P->open[P->nopen - 1] : -1;
}

static int is_special_node(Parser *P, int el) {
    CNode *nd = ND(P, el);
    uint16_t f = tagflags(nd->tag);
    if (nd->ns == NS_HTML) return (f & F_SPECIAL_HTML) != 0;
    if (nd->ns == NS_MATHML) return (f & F_SPECIAL_MATHML) != 0;
    return (f & F_SPECIAL_SVG) != 0;
}

static int is_mathml_text_ip(Parser *P, int el) {
    CNode *nd = ND(P, el);
    if (nd->ns != NS_MATHML) return 0;
    int t = nd->tag;
    return t == TAG_MI || t == TAG_MO || t == TAG_MN || t == TAG_MS
        || t == TAG_MTEXT;
}

static int is_html_ip(Parser *P, int el) {
    CNode *nd = ND(P, el);
    if (nd->ns == NS_SVG
        && (nd->tag == TAG_FOREIGNOBJECT || nd->tag == TAG_DESC
            || nd->tag == TAG_TITLE))
        return 1;
    if (nd->ns == NS_MATHML && nd->tag == TAG_ANNOTATION_XML) {
        int ai = node_attr_find(P, el, "encoding");
        if (ai >= 0) {
            CAttr *a = &P->attrs[ai];
            const uint8_t *v = P->ab.buf + a->voff;
            if (eq_lit_ci(v, a->vlen, "text/html")
                || eq_lit_ci(v, a->vlen, "application/xhtml+xml"))
                return 1;
        }
    }
    return 0;
}

/* "appropriate place for inserting a node": sets (*parent, *before);
 * before = -1 means append. Template-free port of _appropriate_place. */
static void appropriate_place(Parser *P, int override, int *parent,
                              int *before) {
    int target = override >= 0 ? override : cur(P);
    *before = -1;
    if (P->foster && target >= 0) {
        CNode *tn = ND(P, target);
        if (tn->ns == NS_HTML && (tagflags(tn->tag) & F_TABLE_SECTION)) {
            int last_table = -1, last_table_idx = -1, i;
            int last_template = -1, last_template_idx = -1;
            for (i = 0; i < P->nopen; i++) {
                CNode *el = ND(P, P->open[i]);
                if (el->tag == TAG_TEMPLATE && el->ns == NS_HTML) {
                    last_template = P->open[i];
                    last_template_idx = i;
                }
                if (el->tag == TAG_TABLE && el->ns == NS_HTML) {
                    last_table = P->open[i];
                    last_table_idx = i;
                }
            }
            if (last_template >= 0
                && (last_table < 0 || last_template_idx > last_table_idx)) {
                *parent = last_template;  /* append inside the template */
                return;
            }
            if (last_table < 0) { *parent = P->open[0]; return; }
            if (ND(P, last_table)->parent >= 0) {
                *parent = ND(P, last_table)->parent;
                *before = last_table;
                return;
            }
            *parent = P->open[last_table_idx - 1];
            return;
        }
    }
    *parent = target;
}

static void insert_node_at_place(Parser *P, int node, int override) {
    int parent, before;
    appropriate_place(P, override, &parent, &before);
    insert_before(P, parent, node, before);
}

/* copy token attrs into the global pools; adjust: 0 none, 1 svg, 2 mathml */
static void attrs_from_tok(Parser *P, Tok *t, int adjust, int32_t *start,
                           int32_t *count) {
    if (t->nattrs == 0) { *start = -1; *count = 0; return; }
    if (attrs_reserve(P, t->nattrs) < 0) return;
    *start = P->nattrs;
    *count = t->nattrs;
    int i;
    for (i = 0; i < t->nattrs; i++) {
        const uint8_t *nm = t->a[i].n; Py_ssize_t nl = t->a[i].nl;
        if (adjust == 1) {
            const char *adj = entpair_lookup(SVG_ATTR_ADJ, N_SVG_ATTR_ADJ,
                                             nm, nl);
            if (adj) { nm = (const uint8_t *)adj; nl = strlen(adj); }
        } else if (adjust == 2) {
            if (nl == 13 && memcmp(nm, "definitionurl", 13) == 0) {
                nm = (const uint8_t *)"definitionURL"; nl = 13;
            }
        }
        CAttr *a = &P->attrs[P->nattrs++];
        a->nlen = (uint32_t)nl;
        a->vlen = (uint32_t)t->a[i].vl;
        if (pool_put(&P->ab, nm, nl, &a->noff) < 0) P->bail = 1;
        if (pool_put(&P->ab, t->a[i].v, t->a[i].vl, &a->voff) < 0) P->bail = 1;
    }
}

/* create an element node from a start-tag token (name possibly overridden
 * by foreign tag adjustment), without inserting it */
static int elem_from_tok(Parser *P, Tok *t, int ns, int adjust) {
    int el = node_new(P, K_ELEM);
    if (P->bail) return el;
    CNode *nd = ND(P, el);
    nd->ns = (uint8_t)ns;
    const uint8_t *nm = t->name; Py_ssize_t nl = t->nlen;
    if (ns == NS_SVG && adjust) {
        const char *adj = entpair_lookup(SVG_TAG_ADJ, N_SVG_TAG_ADJ, nm, nl);
        if (adj) { nm = (const uint8_t *)adj; nl = strlen(adj); }
    }
    nd->tag = (int16_t)tag_lookup(nm, nl);
    if (nd->tag < 0) {
        uint32_t off;
        if (pool_put(&P->text, nm, nl, &off) < 0) P->bail = 1;
        nd->name_off = (int32_t)off;
        nd->name_len = (int32_t)nl;
    }
    int32_t as, ac;
    attrs_from_tok(P, t, ns == NS_SVG ? 1 : (ns == NS_MATHML ? 2 : 0),
                   &as, &ac);
    nd = ND(P, el);  /* node array may have been untouched, attrs not */
    nd->attr_start = as;
    nd->attr_count = ac;
    return el;
}

/* bare element with a known tag and no attrs */
static int elem_bare(Parser *P, int tag) {
    int el = node_new(P, K_ELEM);
    if (P->bail) return el;
    ND(P, el)->tag = (int16_t)tag;
    ND(P, el)->ns = NS_HTML;
    return el;
}

/* _insert_element: insert at top (or fostered), optionally push */
static int insert_element_node(Parser *P, int el, int push) {
    if (!P->foster) {
        append_child(P, P->open[P->nopen - 1], el);
    } else {
        insert_node_at_place(P, el, -1);
    }
    if (push) open_push(P, el);
    return el;
}

static int insert_element_tok(Parser *P, Tok *t, int push) {
    return insert_element_node(P, elem_from_tok(P, t, NS_HTML, 0), push);
}

static int insert_element_bare(Parser *P, int tag, int push) {
    return insert_element_node(P, elem_bare(P, tag), push);
}

/* append text data to an existing text node (pool-extend fast path) */
static void text_node_append(Parser *P, int tn, const uint8_t *d,
                             Py_ssize_t len) {
    CNode *nd = ND(P, tn);
    if ((size_t)(nd->data_off + nd->data_len) != P->text.len) {
        /* relocate to pool end. Reserve FIRST: pool_put's realloc would
         * invalidate a source pointer into the same pool (latent
         * use-after-free whenever the relocation itself grew the pool). */
        if (pool_reserve(&P->text, (size_t)nd->data_len + (size_t)len) < 0) {
            P->bail = 1;
            return;
        }
        uint32_t noff = (uint32_t)P->text.len;
        memcpy(P->text.buf + P->text.len, P->text.buf + nd->data_off,
               nd->data_len);
        P->text.len += nd->data_len;
        nd = ND(P, tn);
        nd->data_off = noff;
    }
    if (pool_put(&P->text, d, len, NULL) < 0) { P->bail = 1; return; }
    ND(P, tn)->data_len += (uint32_t)len;
}

static int text_node_new(Parser *P, const uint8_t *d, Py_ssize_t len) {
    int tn = node_new(P, K_TEXT);
    if (P->bail) return tn;
    uint32_t off;
    if (pool_put(&P->text, d, len, &off) < 0) { P->bail = 1; return tn; }
    CNode *nd = ND(P, tn);
    nd->data_off = off;
    nd->data_len = (uint32_t)len;
    return tn;
}

static void insert_text(Parser *P, const uint8_t *d, Py_ssize_t len) {
    if (len <= 0 || P->bail) return;
    if (!P->foster) {
        int parent = P->open[P->nopen - 1];
        int last = ND(P, parent)->last_child;
        if (last >= 0 && ND(P, last)->kind == K_TEXT) {
            text_node_append(P, last, d, len);
            return;
        }
        append_child(P, parent, text_node_new(P, d, len));
        return;
    }
    {
        int parent, before;
        appropriate_place(P, -1, &parent, &before);
        if (ND(P, parent)->kind == K_DOC) return;  /* never text into doc */
        int prev = before >= 0 ? ND(P, before)->prev_sib
                               : ND(P, parent)->last_child;
        if (prev >= 0 && ND(P, prev)->kind == K_TEXT) {
            text_node_append(P, prev, d, len);
            return;
        }
        insert_before(P, parent, text_node_new(P, d, len), before);
    }
}

static int comment_node_new(Parser *P, Tok *t) {
    int cn = node_new(P, K_COMMENT);
    if (P->bail) return cn;
    uint32_t off;
    if (pool_put(&P->text, t->data, t->dlen, &off) < 0) P->bail = 1;
    CNode *nd = ND(P, cn);
    nd->data_off = off;
    nd->data_len = (uint32_t)t->dlen;
    return cn;
}

static void insert_comment(Parser *P, Tok *t, int parent_override) {
    int cn = comment_node_new(P, t);
    if (P->bail) return;
    if (parent_override >= 0) append_child(P, parent_override, cn);
    else insert_node_at_place(P, cn, -1);
}

/* ----------------------------------------------------------- scope checks */

static int is_barrier(Parser *P, int el, int kind) {
    CNode *nd = ND(P, el);
    uint16_t f = tagflags(nd->tag);
    if (nd->ns == NS_HTML) {
        if (f & F_SCOPE_BASE) return 1;
        if (kind == B_LIST && (f & F_SCOPE_LIST_EXTRA)) return 1;
        if (kind == B_BUTTON && (f & F_SCOPE_BUTTON_EXTRA)) return 1;
        return 0;
    }
    if (nd->ns == NS_MATHML) return (f & F_SPECIAL_MATHML) != 0;
    return (f & F_SPECIAL_SVG) != 0;
}

static int in_scope_tag(Parser *P, int tag, int kind) {
    int i;
    if (tag == TAG_P && kind == B_BUTTON) {
        /* O(1) via the pscope[] parallel array: this check runs for
         * EVERY block-opener start tag, so the stack walk made deeply
         * nested barrier-less markup (166k <div>s) O(depth^2) — 50 s
         * for a 1 MB document. pscope is maintained at push and
         * refreshed on the rare mid-stack splices (adoption agency). */
        return P->nopen ? P->pscope[P->nopen - 1] : 0;
    }
    for (i = P->nopen - 1; i >= 0; i--) {
        CNode *nd = ND(P, P->open[i]);
        if (nd->ns == NS_HTML && nd->tag == tag) return 1;
        if (is_barrier(P, P->open[i], kind)) return 0;
    }
    return 0;
}

static int in_scope_mask(Parser *P, uint16_t mask, int kind) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        CNode *nd = ND(P, P->open[i]);
        if (nd->ns == NS_HTML && (tagflags(nd->tag) & mask)) return 1;
        if (is_barrier(P, P->open[i], kind)) return 0;
    }
    return 0;
}

static int in_scope_node(Parser *P, int el) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        if (P->open[i] == el) return 1;
        if (is_barrier(P, P->open[i], B_BASE)) return 0;
    }
    return 0;
}

static int in_table_scope_tag(Parser *P, int tag) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        CNode *nd = ND(P, P->open[i]);
        if (nd->ns == NS_HTML) {
            if (nd->tag == tag) return 1;
            if (tagflags(nd->tag) & F_SCOPE_TABLE) return 0;
        }
    }
    return 0;
}

static int in_table_scope_sections(Parser *P) {
    /* target set {tbody, thead, tfoot} */
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        CNode *nd = ND(P, P->open[i]);
        if (nd->ns == NS_HTML) {
            int t = nd->tag;
            if (t == TAG_TBODY || t == TAG_THEAD || t == TAG_TFOOT) return 1;
            if (tagflags(t) & F_SCOPE_TABLE) return 0;
        }
    }
    return 0;
}

static int in_table_scope_cells(Parser *P) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        CNode *nd = ND(P, P->open[i]);
        if (nd->ns == NS_HTML) {
            if (nd->tag == TAG_TD || nd->tag == TAG_TH) return 1;
            if (tagflags(nd->tag) & F_SCOPE_TABLE) return 0;
        }
    }
    return 0;
}

static int in_select_scope(Parser *P, int tag) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        CNode *nd = ND(P, P->open[i]);
        if (nd->tag == tag && nd->ns == NS_HTML) return 1;
        if (!(nd->ns == NS_HTML
              && (nd->tag == TAG_OPTGROUP || nd->tag == TAG_OPTION)))
            return 0;
    }
    return 0;
}

/* -------------------------------------------------------- stack utilities */

static void pop_until_tag(Parser *P, int tag) {
    while (P->nopen) {
        int el = P->open[--P->nopen];
        CNode *nd = ND(P, el);
        if (nd->tag == tag && nd->ns == NS_HTML) return;
    }
}

static void pop_until_mask(Parser *P, uint16_t mask) {
    while (P->nopen) {
        int el = P->open[--P->nopen];
        CNode *nd = ND(P, el);
        if ((tagflags(nd->tag) & mask) && nd->ns == NS_HTML) return;
    }
}

static void pop_until_cell(Parser *P) {
    while (P->nopen) {
        int el = P->open[--P->nopen];
        CNode *nd = ND(P, el);
        if ((nd->tag == TAG_TD || nd->tag == TAG_TH) && nd->ns == NS_HTML)
            return;
    }
}

static void generate_implied_end(Parser *P, int except_tag, int thorough) {
    uint16_t want = thorough ? (F_IMPLIED_THOROUGH) : F_IMPLIED_END;
    while (P->nopen) {
        CNode *nd = ND(P, P->open[P->nopen - 1]);
        if (nd->ns == NS_HTML && (tagflags(nd->tag) & want)
            && nd->tag != except_tag)
            P->nopen--;
        else
            return;
    }
}

static void close_p(Parser *P) {
    generate_implied_end(P, TAG_P, 0);
    pop_until_tag(P, TAG_P);
}

static void clear_to_table_context(Parser *P) {
    for (;;) {
        CNode *nd = ND(P, P->open[P->nopen - 1]);
        if (nd->ns == NS_HTML
            && (nd->tag == TAG_TABLE || nd->tag == TAG_TEMPLATE
                || nd->tag == TAG_HTML))
            return;
        P->nopen--;
    }
}

static void clear_to_table_body_context(Parser *P) {
    for (;;) {
        CNode *nd = ND(P, P->open[P->nopen - 1]);
        if (nd->ns == NS_HTML
            && (nd->tag == TAG_TBODY || nd->tag == TAG_TFOOT
                || nd->tag == TAG_THEAD || nd->tag == TAG_TEMPLATE
                || nd->tag == TAG_HTML))
            return;
        P->nopen--;
    }
}

static void clear_to_table_row_context(Parser *P) {
    for (;;) {
        CNode *nd = ND(P, P->open[P->nopen - 1]);
        if (nd->ns == NS_HTML
            && (nd->tag == TAG_TR || nd->tag == TAG_TEMPLATE
                || nd->tag == TAG_HTML))
            return;
        P->nopen--;
    }
}

/* ------------------------------------------- active formatting elements */

static int tags_equal_nodes(Parser *P, int a, int b) {
    CNode *an = ND(P, a), *bn = ND(P, b);
    if (an->tag != bn->tag || an->ns != bn->ns) return 0;
    if (an->tag < 0) {
        if (an->name_len != bn->name_len) return 0;
        if (memcmp(P->text.buf + an->name_off, P->text.buf + bn->name_off,
                   an->name_len) != 0) return 0;
    }
    return 1;
}

static void push_afe(Parser *P, int el) {
    /* Noah's Ark: max 3 identical entries since the last marker */
    int count = 0, i;
    for (i = P->nafe - 1; i >= 0; i--) {
        int entry = P->afe[i];
        if (entry < 0) break;  /* marker */
        if (tags_equal_nodes(P, entry, el) && attrs_equal(P, entry, el)) {
            count++;
            if (count == 3) { afe_remove_at(P, i); break; }
        }
    }
    afe_push_raw(P, el);
}

/* clone of an element node (attrs shared: the entry range is immutable) */
static int clone_elem(Parser *P, int el) {
    int c = node_new(P, K_ELEM);
    if (P->bail) return c;
    CNode *src = ND(P, el), *dst = ND(P, c);
    dst->tag = src->tag; dst->ns = src->ns;
    dst->name_off = src->name_off; dst->name_len = src->name_len;
    dst->attr_start = src->attr_start; dst->attr_count = src->attr_count;
    return c;
}

static void reconstruct_afe(Parser *P) {
    if (P->nafe == 0) return;
    int last = P->afe[P->nafe - 1];
    if (last < 0 || open_index(P, last) >= 0) return;
    int i = P->nafe - 1;
    while (i > 0) {
        i--;
        int entry = P->afe[i];
        if (entry < 0 || open_index(P, entry) >= 0) { i++; break; }
    }
    for (; i < P->nafe; i++) {
        int clone = clone_elem(P, P->afe[i]);
        if (P->bail) return;
        insert_node_at_place(P, clone, -1);
        open_push(P, clone);
        P->afe[i] = clone;
    }
}

static void clear_afe_to_marker(Parser *P) {
    while (P->nafe) {
        int entry = P->afe[--P->nafe];
        if (entry < 0) return;
    }
}

/* ------------------------------------------------------------- template */

/* treebuilder.py guards use bare `e.tag == "template"` (namespace-blind);
 * _end_template's stack check requires the HTML namespace — mirror both. */
static int stack_has_template_anyns(Parser *P) {
    int i;
    for (i = 0; i < P->nopen; i++)
        if (ND(P, P->open[i])->tag == TAG_TEMPLATE) return 1;
    return 0;
}

static int stack_has_template_html(Parser *P) {
    int i;
    for (i = 0; i < P->nopen; i++) {
        CNode *nd = ND(P, P->open[i]);
        if (nd->tag == TAG_TEMPLATE && nd->ns == NS_HTML) return 1;
    }
    return 0;
}

static void tmode_push(Parser *P, int mode) {
    if (P->ntmodes >= MAX_TMODES) { P->bail = 1; return; }
    P->tmodes[P->ntmodes++] = mode;
}

static void tmode_switch(Parser *P, int mode) {
    if (P->ntmodes) P->ntmodes--;
    tmode_push(P, mode);
    P->mode = mode;
}

/* -------------------------------------------------- reset insertion mode */

static void reset_insertion_mode(Parser *P) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        int el = P->open[i];
        CNode *nd = ND(P, el);
        int last = (i == 0);
        int tag = nd->ns == NS_HTML ? nd->tag : -2;
        if (tag == TAG_SELECT) {
            int mode = M_IN_SELECT, j;
            if (!last) {
                for (j = i - 1; j > 0; j--) {
                    CNode *anc = ND(P, P->open[j]);
                    if (anc->tag == TAG_TEMPLATE) break;
                    if (anc->tag == TAG_TABLE) {
                        mode = M_IN_SELECT_IN_TABLE;
                        break;
                    }
                }
            }
            P->mode = mode;
            return;
        }
        if ((tag == TAG_TD || tag == TAG_TH) && !last) {
            P->mode = M_IN_CELL; return;
        }
        if (tag == TAG_TR) { P->mode = M_IN_ROW; return; }
        if (tag == TAG_TBODY || tag == TAG_THEAD || tag == TAG_TFOOT) {
            P->mode = M_IN_TABLE_BODY; return;
        }
        if (tag == TAG_CAPTION) { P->mode = M_IN_CAPTION; return; }
        if (tag == TAG_COLGROUP) { P->mode = M_IN_COLUMN_GROUP; return; }
        if (tag == TAG_TABLE) { P->mode = M_IN_TABLE; return; }
        if (tag == TAG_TEMPLATE) {
            if (P->ntmodes == 0) { P->bail = 1; return; }
            P->mode = P->tmodes[P->ntmodes - 1];
            return;
        }
        if (tag == TAG_HEAD && !last) { P->mode = M_IN_HEAD; return; }
        if (tag == TAG_BODY) { P->mode = M_IN_BODY; return; }
        if (tag == TAG_FRAMESET) { P->mode = M_IN_FRAMESET; return; }
        if (tag == TAG_HTML) {
            P->mode = P->head_ptr < 0 ? M_BEFORE_HEAD : M_AFTER_HEAD;
            return;
        }
        if (last) { P->mode = M_IN_BODY; return; }
    }
}

/* --------------------------------------------------- quirks classification */

static int prefix_match_ci(const uint8_t *s, Py_ssize_t len, const char *pfx) {
    size_t pl = strlen(pfx);
    if ((size_t)len < pl) return 0;
    size_t i;
    for (i = 0; i < pl; i++)
        if (lo(s[i]) != (uint8_t)pfx[i]) return 0;
    return 1;
}

static int full_match_ci(const uint8_t *s, Py_ssize_t len, const char *lit) {
    return (size_t)len == strlen(lit) && prefix_match_ci(s, len, lit);
}

static int classify_quirks(Tok *t) {
    if (t->force_quirks || !t->has_name || !full_match_ci(t->name, t->nlen, "html"))
        return QM_QUIRKS;
    int i;
    if (t->has_public) {
        for (i = 0; i < N_QUIRKY_PUBLIC_EXACT; i++)
            if (full_match_ci(t->pub, t->publen, QUIRKY_PUBLIC_EXACT[i]))
                return QM_QUIRKS;
        for (i = 0; i < N_QUIRKY_PUBLIC_PREFIXES; i++)
            if (prefix_match_ci(t->pub, t->publen, QUIRKY_PUBLIC_PREFIXES[i]))
                return QM_QUIRKS;
        if (!t->has_system) {
            for (i = 0; i < N_QUIRKY_IF_NO_SYSTEM_PREFIXES; i++)
                if (prefix_match_ci(t->pub, t->publen,
                                    QUIRKY_IF_NO_SYSTEM_PREFIXES[i]))
                    return QM_QUIRKS;
        }
    }
    if (t->has_system) {
        for (i = 0; i < N_QUIRKY_SYSTEM_EXACT; i++)
            if (full_match_ci(t->sys, t->syslen, QUIRKY_SYSTEM_EXACT[i]))
                return QM_QUIRKS;
    }
    if (t->has_public) {
        for (i = 0; i < N_LIMITED_QUIRKS_PREFIXES; i++)
            if (prefix_match_ci(t->pub, t->publen, LIMITED_QUIRKS_PREFIXES[i]))
                return QM_LIMITED;
        if (t->has_system) {
            for (i = 0; i < N_QUIRKY_IF_NO_SYSTEM_PREFIXES; i++)
                if (prefix_match_ci(t->pub, t->publen,
                                    QUIRKY_IF_NO_SYSTEM_PREFIXES[i]))
                    return QM_LIMITED;
        }
    }
    return QM_NO;
}

/* ------------------------------------------------------------ mode handlers */

static int mode_in_body(Parser *P, Tok *t);
static int mode_in_head(Parser *P, Tok *t);
static int mode_in_table(Parser *P, Tok *t);
static int mode_in_select(Parser *P, Tok *t);
static int mode_in_template(Parser *P, Tok *t);
static int end_template(Parser *P);
static int in_body_start(Parser *P, Tok *t);
static int in_body_end(Parser *P, Tok *t);
static int any_other_end_tag(Parser *P, Tok *t);
static int adoption_agency(Parser *P, Tok *t);
static void process_token(Parser *P, Tok *t);

static Py_ssize_t ws_prefix(const uint8_t *d, Py_ssize_t len) {
    Py_ssize_t i = 0;
    while (i < len && (d[i] == ' ' || d[i] == '\t' || d[i] == '\n'
                       || d[i] == 0x0c || d[i] == '\r')) i++;
    return i;
}

static int all_ws(const uint8_t *d, Py_ssize_t len) {
    return ws_prefix(d, len) == len;
}

/* strip NULs from chars data into tokp (returns 1 when anything remains) */
static void strip_nuls(Parser *P, Tok *t) {
    if (!memchr(t->data, 0, t->dlen)) return;
    P->tokp.len = 0;
    Py_ssize_t i;
    for (i = 0; i < t->dlen; i++) {
        if (t->data[i] != 0) {
            if (pool_putc(&P->tokp, t->data[i]) < 0) P->bail = 1;
        }
    }
    t->data = P->tokp.buf;
    t->dlen = (Py_ssize_t)P->tokp.len;
}

static void set_rawtextish(Parser *P, Tok *t, int tstate) {
    insert_element_tok(P, t, 1);
    P->tstate = tstate;
    P->original_mode = P->mode;
    P->mode = M_TEXT;
}

/* ---- mode: text (script/rcdata/rawtext content) ---- */
static int mode_text(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) { insert_text(P, t->data, t->dlen); return RC_DONE; }
    if (t->kind == TK_EOF) {
        P->nopen--;
        P->mode = P->original_mode;
        return RC_REPROCESS;
    }
    P->nopen--;
    P->mode = P->original_mode;
    return RC_DONE;
}

/* ---- mode: initial ---- */
static int mode_initial(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) {
        Py_ssize_t i = ws_prefix(t->data, t->dlen);
        if (i == t->dlen) return RC_DONE;
        P->quirks = QM_QUIRKS;
        P->mode = M_BEFORE_HTML;
        t->data += i; t->dlen -= i;
        return RC_REPROCESS;
    }
    if (t->kind == TK_COMMENT) { insert_comment(P, t, 0); return RC_DONE; }
    if (t->kind == TK_DOCTYPE) {
        int dt = node_new(P, K_DOCTYPE);
        if (P->bail) return RC_DONE;
        {
            CNode *nd = ND(P, dt);
            uint32_t off;
            if (pool_put(&P->text, t->name, t->has_name ? t->nlen : 0,
                         &off) < 0) P->bail = 1;
            nd->name_off = (int32_t)off;
            nd->name_len = (int32_t)(t->has_name ? t->nlen : 0);
            if (pool_put(&P->text, t->pub, t->has_public ? t->publen : 0,
                         &off) < 0) P->bail = 1;
            nd = ND(P, dt);
            nd->pub_off = off; nd->pub_len = (uint32_t)(t->has_public ? t->publen : 0);
            if (pool_put(&P->text, t->sys, t->has_system ? t->syslen : 0,
                         &off) < 0) P->bail = 1;
            nd = ND(P, dt);
            nd->sys_off = off; nd->sys_len = (uint32_t)(t->has_system ? t->syslen : 0);
        }
        append_child(P, 0, dt);
        P->quirks = classify_quirks(t);
        P->mode = M_BEFORE_HTML;
        return RC_DONE;
    }
    P->quirks = QM_QUIRKS;
    P->mode = M_BEFORE_HTML;
    return RC_REPROCESS;
}

/* ---- mode: before html ---- */
static int mode_before_html(Parser *P, Tok *t) {
    if (t->kind == TK_DOCTYPE) return RC_DONE;
    if (t->kind == TK_COMMENT) { insert_comment(P, t, 0); return RC_DONE; }
    if (t->kind == TK_CHARS) {
        Py_ssize_t i = ws_prefix(t->data, t->dlen);
        if (i == t->dlen) return RC_DONE;
        t->data += i; t->dlen -= i;
    } else if (t->kind == TK_START && t->tag == TAG_HTML) {
        int el = elem_from_tok(P, t, NS_HTML, 0);
        append_child(P, 0, el);
        open_push(P, el);
        P->mode = M_BEFORE_HEAD;
        return RC_DONE;
    } else if (t->kind == TK_END && t->tag != TAG_HEAD && t->tag != TAG_BODY
               && t->tag != TAG_HTML && t->tag != TAG_BR) {
        return RC_DONE;
    }
    {
        int el = elem_bare(P, TAG_HTML);
        append_child(P, 0, el);
        open_push(P, el);
        P->mode = M_BEFORE_HEAD;
    }
    return RC_REPROCESS;
}

/* ---- mode: before head ---- */
static int mode_before_head(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) {
        Py_ssize_t i = ws_prefix(t->data, t->dlen);
        if (i == t->dlen) return RC_DONE;
        t->data += i; t->dlen -= i;
    } else if (t->kind == TK_COMMENT) {
        insert_comment(P, t, -1); return RC_DONE;
    } else if (t->kind == TK_DOCTYPE) {
        return RC_DONE;
    } else if (t->kind == TK_START) {
        if (t->tag == TAG_HTML) return mode_in_body(P, t);
        if (t->tag == TAG_HEAD) {
            P->head_ptr = insert_element_tok(P, t, 1);
            P->mode = M_IN_HEAD;
            return RC_DONE;
        }
    } else if (t->kind == TK_END && t->tag != TAG_HEAD && t->tag != TAG_BODY
               && t->tag != TAG_HTML && t->tag != TAG_BR) {
        return RC_DONE;
    }
    P->head_ptr = insert_element_bare(P, TAG_HEAD, 1);
    P->mode = M_IN_HEAD;
    return RC_REPROCESS;
}

/* ---- mode: in head ---- */
/* ---- template close + mode (treebuilder.py _end_template /
 * _mode_in_template) ---- */
static int end_template(Parser *P) {
    if (!stack_has_template_html(P)) return RC_DONE;
    generate_implied_end(P, -2, 1);  /* thorough */
    pop_until_tag(P, TAG_TEMPLATE);
    clear_afe_to_marker(P);
    if (P->ntmodes) P->ntmodes--;
    reset_insertion_mode(P);
    return RC_DONE;
}

static int mode_in_template(Parser *P, Tok *t) {
    switch (t->kind) {
    case TK_CHARS: case TK_COMMENT: case TK_DOCTYPE:
        return mode_in_body(P, t);
    case TK_START:
        switch (t->tag) {
        case TAG_BASE: case TAG_BASEFONT: case TAG_BGSOUND: case TAG_LINK:
        case TAG_META: case TAG_NOFRAMES: case TAG_SCRIPT: case TAG_STYLE:
        case TAG_TEMPLATE: case TAG_TITLE:
            return mode_in_head(P, t);
        case TAG_CAPTION: case TAG_COLGROUP: case TAG_TBODY: case TAG_TFOOT:
        case TAG_THEAD:
            tmode_switch(P, M_IN_TABLE);
            return RC_REPROCESS;
        case TAG_COL:
            tmode_switch(P, M_IN_COLUMN_GROUP);
            return RC_REPROCESS;
        case TAG_TR:
            tmode_switch(P, M_IN_TABLE_BODY);
            return RC_REPROCESS;
        case TAG_TD: case TAG_TH:
            tmode_switch(P, M_IN_ROW);
            return RC_REPROCESS;
        }
        tmode_switch(P, M_IN_BODY);
        return RC_REPROCESS;
    case TK_END:
        if (t->tag == TAG_TEMPLATE) return end_template(P);
        return RC_DONE;
    default:  /* EOF */
        if (!stack_has_template_html(P)) {
            P->stopped = 1;
            return RC_DONE;
        }
        pop_until_tag(P, TAG_TEMPLATE);
        clear_afe_to_marker(P);
        if (P->ntmodes) P->ntmodes--;
        reset_insertion_mode(P);
        return RC_REPROCESS;
    }
}

static int mode_in_head(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) {
        Py_ssize_t i = ws_prefix(t->data, t->dlen);
        if (i) insert_text(P, t->data, i);
        if (i == t->dlen) return RC_DONE;
        P->nopen--;
        P->mode = M_AFTER_HEAD;
        t->data += i; t->dlen -= i;
        return RC_REPROCESS;
    }
    if (t->kind == TK_COMMENT) { insert_comment(P, t, -1); return RC_DONE; }
    if (t->kind == TK_DOCTYPE) return RC_DONE;
    if (t->kind == TK_START) {
        switch (t->tag) {
        case TAG_HTML: return mode_in_body(P, t);
        case TAG_BASE: case TAG_BASEFONT: case TAG_BGSOUND: case TAG_LINK:
            insert_element_tok(P, t, 0); return RC_DONE;
        case TAG_META:
            insert_element_tok(P, t, 0); return RC_DONE;
        case TAG_TITLE:
            set_rawtextish(P, t, S_RCDATA); return RC_DONE;
        case TAG_NOSCRIPT:
            if (!P->scripting) {
                insert_element_tok(P, t, 1);
                P->mode = M_IN_HEAD_NOSCRIPT;
                return RC_DONE;
            }
            set_rawtextish(P, t, S_RAWTEXT); return RC_DONE;
        case TAG_NOFRAMES: case TAG_STYLE:
            set_rawtextish(P, t, S_RAWTEXT); return RC_DONE;
        case TAG_SCRIPT:
            insert_element_tok(P, t, 1);
            P->tstate = S_SCRIPT;
            P->original_mode = P->mode;
            P->mode = M_TEXT;
            return RC_DONE;
        case TAG_TEMPLATE:
            insert_element_tok(P, t, 1);
            afe_push_raw(P, -1);  /* marker */
            P->frameset_ok = 0;
            P->mode = M_IN_TEMPLATE;
            tmode_push(P, M_IN_TEMPLATE);
            return RC_DONE;
        case TAG_HEAD:
            return RC_DONE;
        }
    } else if (t->kind == TK_END) {
        if (t->tag == TAG_HEAD) {
            P->nopen--;
            P->mode = M_AFTER_HEAD;
            return RC_DONE;
        }
        if (t->tag == TAG_TEMPLATE) return end_template(P);
        if (t->tag != TAG_BODY && t->tag != TAG_HTML && t->tag != TAG_BR)
            return RC_DONE;
    }
    P->nopen--;
    P->mode = M_AFTER_HEAD;
    return RC_REPROCESS;
}

/* ---- mode: in head noscript (scripting=False path) ---- */
static int mode_in_head_noscript(Parser *P, Tok *t) {
    if (t->kind == TK_DOCTYPE) return RC_DONE;
    if (t->kind == TK_START && t->tag == TAG_HTML) return mode_in_body(P, t);
    if (t->kind == TK_END && t->tag == TAG_NOSCRIPT) {
        P->nopen--;
        P->mode = M_IN_HEAD;
        return RC_DONE;
    }
    if (t->kind == TK_CHARS) {
        Py_ssize_t i = ws_prefix(t->data, t->dlen);
        if (i) insert_text(P, t->data, i);
        if (i == t->dlen) return RC_DONE;
        P->nopen--;
        P->mode = M_IN_HEAD;
        t->data += i; t->dlen -= i;
        return RC_REPROCESS;
    }
    if (t->kind == TK_COMMENT) return mode_in_head(P, t);
    if (t->kind == TK_START) {
        switch (t->tag) {
        case TAG_BASEFONT: case TAG_BGSOUND: case TAG_LINK: case TAG_META:
        case TAG_NOFRAMES: case TAG_STYLE:
            return mode_in_head(P, t);
        case TAG_HEAD: case TAG_NOSCRIPT:
            return RC_DONE;
        }
    }
    if (t->kind == TK_END && t->tag != TAG_BR) return RC_DONE;
    P->nopen--;
    P->mode = M_IN_HEAD;
    return RC_REPROCESS;
}

/* ---- mode: after head ---- */
static int mode_after_head(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) {
        Py_ssize_t i = ws_prefix(t->data, t->dlen);
        if (i) insert_text(P, t->data, i);
        if (i == t->dlen) return RC_DONE;
        t->data += i; t->dlen -= i;
    } else if (t->kind == TK_COMMENT) {
        insert_comment(P, t, -1); return RC_DONE;
    } else if (t->kind == TK_DOCTYPE) {
        return RC_DONE;
    } else if (t->kind == TK_START) {
        switch (t->tag) {
        case TAG_HTML: return mode_in_body(P, t);
        case TAG_BODY:
            insert_element_tok(P, t, 1);
            P->frameset_ok = 0;
            P->mode = M_IN_BODY;
            return RC_DONE;
        case TAG_FRAMESET:
            insert_element_tok(P, t, 1);
            P->mode = M_IN_FRAMESET;
            return RC_DONE;
        case TAG_BASE: case TAG_BASEFONT: case TAG_BGSOUND: case TAG_LINK:
        case TAG_META: case TAG_NOFRAMES: case TAG_SCRIPT: case TAG_STYLE:
        case TAG_TEMPLATE: case TAG_TITLE: {
            open_push(P, P->head_ptr);
            mode_in_head(P, t);
            {
                int idx = open_index(P, P->head_ptr);
                if (idx >= 0) open_remove_at(P, idx);
            }
            return RC_DONE;
        }
        case TAG_HEAD:
            return RC_DONE;
        }
    } else if (t->kind == TK_END) {
        if (t->tag == TAG_TEMPLATE) return mode_in_head(P, t);
        if (t->tag != TAG_BODY && t->tag != TAG_HTML && t->tag != TAG_BR)
            return RC_DONE;
    }
    insert_element_bare(P, TAG_BODY, 1);
    P->mode = M_IN_BODY;
    return RC_REPROCESS;
}

/* ---- mode: in body ---- */

static void merge_attrs_into(Parser *P, int el, Tok *t) {
    /* add token attrs missing from el (html/body merge). The element's
     * attr entries must stay contiguous, so rebuild the range at the end
     * of the attrs array when anything is added. */
    int add[MAX_TOK_ATTRS], nadd = 0, i;
    CNode *nd = ND(P, el);
    for (i = 0; i < t->nattrs; i++) {
        int j, found = 0;
        for (j = 0; j < nd->attr_count; j++) {
            CAttr *a = &P->attrs[nd->attr_start + j];
            if (a->nlen == (uint32_t)t->a[i].nl
                && memcmp(P->ab.buf + a->noff, t->a[i].n, a->nlen) == 0) {
                found = 1; break;
            }
        }
        if (!found) add[nadd++] = i;
    }
    if (!nadd) return;
    if (attrs_reserve(P, nd->attr_count + nadd) < 0) return;
    nd = ND(P, el);
    int new_start = P->nattrs;
    for (i = 0; i < nd->attr_count; i++)
        P->attrs[P->nattrs++] = P->attrs[nd->attr_start + i];
    for (i = 0; i < nadd; i++) {
        CAttr *a = &P->attrs[P->nattrs++];
        a->nlen = (uint32_t)t->a[add[i]].nl;
        a->vlen = (uint32_t)t->a[add[i]].vl;
        if (pool_put(&P->ab, t->a[add[i]].n, a->nlen, &a->noff) < 0)
            P->bail = 1;
        if (pool_put(&P->ab, t->a[add[i]].v, a->vlen, &a->voff) < 0)
            P->bail = 1;
    }
    nd->attr_start = new_start;
    nd->attr_count += nadd;
}

static int mode_in_body(Parser *P, Tok *t) {
    switch (t->kind) {
    case TK_CHARS: {
        strip_nuls(P, t);
        if (t->dlen == 0) return RC_DONE;
        reconstruct_afe(P);
        insert_text(P, t->data, t->dlen);
        if (P->frameset_ok && !all_ws(t->data, t->dlen))
            P->frameset_ok = 0;
        return RC_DONE;
    }
    case TK_COMMENT:
        insert_comment(P, t, -1);
        return RC_DONE;
    case TK_DOCTYPE:
        return RC_DONE;
    case TK_START:
        return in_body_start(P, t);
    case TK_END:
        return in_body_end(P, t);
    default:  /* EOF */
        if (P->ntmodes) return mode_in_template(P, t);
        P->stopped = 1;
        return RC_DONE;
    }
}

static void pop_current_menuitem(Parser *P) {
    int c = cur(P);
    if (c >= 0 && ND(P, c)->tag == TAG_MENUITEM && ND(P, c)->ns == NS_HTML)
        P->nopen--;
}

static int in_body_start(Parser *P, Tok *t) {
    uint16_t f = tagflags(t->tag);
    switch (t->tag) {
    case TAG_HTML:
        if (stack_has_template_anyns(P)) return RC_DONE;
        merge_attrs_into(P, P->open[0], t);
        return RC_DONE;
    case TAG_BASE: case TAG_BASEFONT: case TAG_BGSOUND: case TAG_LINK:
    case TAG_META: case TAG_NOFRAMES: case TAG_SCRIPT: case TAG_STYLE:
    case TAG_TEMPLATE: case TAG_TITLE:
        return mode_in_head(P, t);
    case TAG_BODY: {
        if (P->nopen < 2 || ND(P, P->open[1])->tag != TAG_BODY
            || stack_has_template_anyns(P))
            return RC_DONE;
        P->frameset_ok = 0;
        merge_attrs_into(P, P->open[1], t);
        return RC_DONE;
    }
    case TAG_FRAMESET: {
        if (P->nopen < 2 || ND(P, P->open[1])->tag != TAG_BODY)
            return RC_DONE;
        if (!P->frameset_ok) return RC_DONE;
        detach(P, P->open[1]);
        P->nopen = 1;
        insert_element_tok(P, t, 1);
        P->mode = M_IN_FRAMESET;
        return RC_DONE;
    }
    case TAG_PRE: case TAG_LISTING:
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        insert_element_tok(P, t, 1);
        P->ignore_next_lf = 1;
        P->frameset_ok = 0;
        return RC_DONE;
    case TAG_FORM: {
        int has_tmpl = stack_has_template_anyns(P);
        if (P->form_ptr >= 0 && !has_tmpl) return RC_DONE;
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        {
            int el = insert_element_tok(P, t, 1);
            if (!has_tmpl) P->form_ptr = el;
        }
        return RC_DONE;
    }
    case TAG_LI: {
        int i;
        P->frameset_ok = 0;
        for (i = P->nopen - 1; i >= 0; i--) {
            CNode *nd = ND(P, P->open[i]);
            if (nd->tag == TAG_LI && nd->ns == NS_HTML) {
                generate_implied_end(P, TAG_LI, 0);
                pop_until_tag(P, TAG_LI);
                break;
            }
            if (is_special_node(P, P->open[i])
                && nd->tag != TAG_ADDRESS && nd->tag != TAG_DIV
                && nd->tag != TAG_P)
                break;
        }
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        insert_element_tok(P, t, 1);
        return RC_DONE;
    }
    case TAG_DD: case TAG_DT: {
        int i;
        P->frameset_ok = 0;
        for (i = P->nopen - 1; i >= 0; i--) {
            CNode *nd = ND(P, P->open[i]);
            if ((nd->tag == TAG_DD || nd->tag == TAG_DT)
                && nd->ns == NS_HTML) {
                generate_implied_end(P, nd->tag, 0);
                pop_until_tag(P, nd->tag);
                break;
            }
            if (is_special_node(P, P->open[i])
                && nd->tag != TAG_ADDRESS && nd->tag != TAG_DIV
                && nd->tag != TAG_P)
                break;
        }
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        insert_element_tok(P, t, 1);
        return RC_DONE;
    }
    case TAG_PLAINTEXT:
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        insert_element_tok(P, t, 1);
        P->tstate = S_PLAINTEXT;
        return RC_DONE;
    case TAG_BUTTON:
        if (in_scope_tag(P, TAG_BUTTON, B_BASE)) {
            generate_implied_end(P, -2, 0);
            pop_until_tag(P, TAG_BUTTON);
        }
        reconstruct_afe(P);
        insert_element_tok(P, t, 1);
        P->frameset_ok = 0;
        return RC_DONE;
    case TAG_A: {
        int i;
        for (i = P->nafe - 1; i >= 0; i--) {
            int entry = P->afe[i];
            if (entry < 0) break;
            if (ND(P, entry)->tag == TAG_A) {
                adoption_agency(P, t);
                {
                    int j = afe_index(P, entry);
                    if (j >= 0) afe_remove_at(P, j);
                    j = open_index(P, entry);
                    if (j >= 0) open_remove_at(P, j);
                }
                break;
            }
        }
        reconstruct_afe(P);
        push_afe(P, insert_element_tok(P, t, 1));
        return RC_DONE;
    }
    case TAG_NOBR:
        reconstruct_afe(P);
        if (in_scope_tag(P, TAG_NOBR, B_BASE)) {
            adoption_agency(P, t);
            reconstruct_afe(P);
        }
        push_afe(P, insert_element_tok(P, t, 1));
        return RC_DONE;
    case TAG_APPLET: case TAG_MARQUEE: case TAG_OBJECT:
        reconstruct_afe(P);
        insert_element_tok(P, t, 1);
        afe_push_raw(P, -1);  /* marker */
        P->frameset_ok = 0;
        return RC_DONE;
    case TAG_TABLE:
        if (P->quirks != QM_QUIRKS && in_scope_tag(P, TAG_P, B_BUTTON))
            close_p(P);
        insert_element_tok(P, t, 1);
        P->frameset_ok = 0;
        P->mode = M_IN_TABLE;
        return RC_DONE;
    case TAG_INPUT: {
        reconstruct_afe(P);
        insert_element_tok(P, t, 0);
        {
            int ai = tok_attr_find(t, "type");
            if (ai < 0 || !eq_lit_ci(t->a[ai].v, t->a[ai].vl, "hidden"))
                P->frameset_ok = 0;
        }
        return RC_DONE;
    }
    case TAG_PARAM: case TAG_SOURCE: case TAG_TRACK:
        insert_element_tok(P, t, 0);
        return RC_DONE;
    case TAG_HR:
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        pop_current_menuitem(P);
        insert_element_tok(P, t, 0);
        P->frameset_ok = 0;
        return RC_DONE;
    case TAG_IMAGE:
        /* translated to <img> and re-dispatched */
        t->tag = TAG_IMG;
        t->name = (const uint8_t *)"img";
        t->nlen = 3;
        return in_body_start(P, t);
    case TAG_TEXTAREA:
        insert_element_tok(P, t, 1);
        P->ignore_next_lf = 1;
        P->tstate = S_RCDATA;
        P->original_mode = P->mode;
        P->frameset_ok = 0;
        P->mode = M_TEXT;
        return RC_DONE;
    case TAG_XMP:
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        reconstruct_afe(P);
        P->frameset_ok = 0;
        set_rawtextish(P, t, S_RAWTEXT);
        return RC_DONE;
    case TAG_IFRAME:
        P->frameset_ok = 0;
        set_rawtextish(P, t, S_RAWTEXT);
        return RC_DONE;
    case TAG_NOEMBED:
        set_rawtextish(P, t, S_RAWTEXT);
        return RC_DONE;
    case TAG_NOSCRIPT:
        if (P->scripting) {
            set_rawtextish(P, t, S_RAWTEXT);
            return RC_DONE;
        }
        reconstruct_afe(P);
        insert_element_tok(P, t, 1);
        return RC_DONE;
    case TAG_SELECT:
        reconstruct_afe(P);
        insert_element_tok(P, t, 1);
        P->frameset_ok = 0;
        if (P->mode == M_IN_TABLE || P->mode == M_IN_CAPTION
            || P->mode == M_IN_TABLE_BODY || P->mode == M_IN_ROW
            || P->mode == M_IN_CELL)
            P->mode = M_IN_SELECT_IN_TABLE;
        else
            P->mode = M_IN_SELECT;
        return RC_DONE;
    case TAG_OPTGROUP: case TAG_OPTION: {
        int c = cur(P);
        if (c >= 0 && ND(P, c)->tag == TAG_OPTION && ND(P, c)->ns == NS_HTML)
            P->nopen--;
        reconstruct_afe(P);
        insert_element_tok(P, t, 1);
        return RC_DONE;
    }
    case TAG_RB: case TAG_RTC:
        if (in_scope_tag(P, TAG_RUBY, B_BASE)) {
            generate_implied_end(P, -2, 0);
        }
        insert_element_tok(P, t, 1);
        return RC_DONE;
    case TAG_RP: case TAG_RT:
        if (in_scope_tag(P, TAG_RUBY, B_BASE)) {
            generate_implied_end(P, TAG_RTC, 0);
        }
        insert_element_tok(P, t, 1);
        return RC_DONE;
    case TAG_MATH: {
        reconstruct_afe(P);
        int el = elem_from_tok(P, t, NS_MATHML, 0);
        insert_node_at_place(P, el, -1);
        if (!t->self_closing) open_push(P, el);
        P->saw_foreign = 1;
        return RC_DONE;
    }
    case TAG_SVG: {
        reconstruct_afe(P);
        int el = elem_from_tok(P, t, NS_SVG, 0);
        insert_node_at_place(P, el, -1);
        if (!t->self_closing) open_push(P, el);
        P->saw_foreign = 1;
        return RC_DONE;
    }
    case TAG_MENU:
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        pop_current_menuitem(P);
        insert_element_tok(P, t, 1);
        return RC_DONE;
    case TAG_MENUITEM:
        pop_current_menuitem(P);
        reconstruct_afe(P);
        insert_element_tok(P, t, 1);
        return RC_DONE;
    case TAG_CAPTION: case TAG_COL: case TAG_COLGROUP: case TAG_FRAME:
    case TAG_HEAD: case TAG_TBODY: case TAG_TD: case TAG_TFOOT: case TAG_TH:
    case TAG_THEAD: case TAG_TR:
        return RC_DONE;  /* ignored */
    }
    if (f & F_BLOCK_OPENER) {
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        insert_element_tok(P, t, 1);
        return RC_DONE;
    }
    if (f & F_HEADING) {
        if (in_scope_tag(P, TAG_P, B_BUTTON)) close_p(P);
        {
            int c = cur(P);
            if (c >= 0 && (tagflags(ND(P, c)->tag) & F_HEADING)
                && ND(P, c)->ns == NS_HTML)
                P->nopen--;
        }
        insert_element_tok(P, t, 1);
        return RC_DONE;
    }
    if (f & F_FORMATTING) {  /* b big code em font i s small strike strong tt u */
        reconstruct_afe(P);
        push_afe(P, insert_element_tok(P, t, 1));
        return RC_DONE;
    }
    if (f & F_VOID_INBODY) {
        reconstruct_afe(P);
        insert_element_tok(P, t, 0);
        P->frameset_ok = 0;
        return RC_DONE;
    }
    /* any other start tag */
    reconstruct_afe(P);
    insert_element_tok(P, t, 1);
    return RC_DONE;
}

/* does node el (HTML ns check done by caller) match the token's tag name? */
static int node_tag_matches_tok(Parser *P, int el, Tok *t) {
    CNode *nd = ND(P, el);
    if (t->tag >= 0) return nd->tag == t->tag;
    if (nd->tag >= 0) return 0;
    return nd->name_len == t->nlen
        && memcmp(P->text.buf + nd->name_off, t->name, t->nlen) == 0;
}

static int any_other_end_tag(Parser *P, Tok *t) {
    int i;
    for (i = P->nopen - 1; i >= 0; i--) {
        int el = P->open[i];
        CNode *nd = ND(P, el);
        if (nd->ns == NS_HTML && node_tag_matches_tok(P, el, t)) {
            generate_implied_end(P, t->tag >= 0 ? t->tag : -3, 0);
            while (P->nopen) {
                if (P->open[--P->nopen] == el) break;
            }
            return RC_DONE;
        }
        if (is_special_node(P, el)) return RC_DONE;
    }
    return RC_DONE;
}

/* adoption agency; returns 1 when the caller must run any-other-end-tag */
static int adoption_agency(Parser *P, Tok *t) {
    int subject = t->tag;  /* always a known formatting tag */
    {
        int c = cur(P);
        if (c >= 0 && ND(P, c)->ns == NS_HTML && ND(P, c)->tag == subject
            && afe_index(P, c) < 0) {
            P->nopen--;
            return 0;
        }
    }
    int outer;
    for (outer = 0; outer < 8; outer++) {
        int fmt = -1, i;
        for (i = P->nafe - 1; i >= 0; i--) {
            int entry = P->afe[i];
            if (entry < 0) break;
            if (ND(P, entry)->tag == subject) { fmt = entry; break; }
        }
        if (fmt < 0) return 1;
        int fmt_idx = open_index(P, fmt);
        if (fmt_idx < 0) {
            afe_remove_at(P, afe_index(P, fmt));
            return 0;
        }
        if (!in_scope_node(P, fmt)) return 0;
        int furthest = -1;
        for (i = fmt_idx + 1; i < P->nopen; i++) {
            if (is_special_node(P, P->open[i])) { furthest = P->open[i]; break; }
        }
        if (furthest < 0) {
            P->nopen = fmt_idx;
            afe_remove_at(P, afe_index(P, fmt));
            return 0;
        }
        int common_ancestor = P->open[fmt_idx - 1];
        int bookmark = afe_index(P, fmt);
        int node = furthest, last_node = furthest;
        int node_above = P->open[open_index(P, node) - 1];
        int inner = 0;
        for (;;) {
            inner++;
            node = node_above;
            if (node == fmt) break;
            {
                int idx = open_index(P, node);
                node_above = P->open[idx - 1];
            }
            if (inner > 3 && afe_index(P, node) >= 0)
                afe_remove_at(P, afe_index(P, node));
            if (afe_index(P, node) < 0) {
                open_remove_at(P, open_index(P, node));
                continue;
            }
            {
                int clone = clone_elem(P, node);
                int oi;
                if (P->bail) return 0;
                P->afe[afe_index(P, node)] = clone;
                oi = open_index(P, node);
                P->open[oi] = clone;
                pscope_refresh_from(P, oi);
                node = clone;
            }
            if (last_node == furthest)
                bookmark = afe_index(P, node) + 1;
            append_child(P, node, last_node);
            last_node = node;
        }
        detach(P, last_node);
        {
            int saved = P->foster;
            CNode *ca = ND(P, common_ancestor);
            if (ca->ns == NS_HTML && (tagflags(ca->tag) & F_TABLE_SECTION))
                P->foster = 1;
            {
                int parent, before;
                appropriate_place(P, common_ancestor, &parent, &before);
                insert_before(P, parent, last_node, before);
            }
            P->foster = saved;
        }
        {
            int clone = clone_elem(P, fmt);
            if (P->bail) return 0;
            /* move furthest's children into the clone */
            while (ND(P, furthest)->first_child >= 0) {
                int c = ND(P, furthest)->first_child;
                detach(P, c);
                append_child(P, clone, c);
            }
            append_child(P, furthest, clone);
            {
                int fmt_afe_idx = afe_index(P, fmt);
                afe_remove_at(P, fmt_afe_idx);
                if (fmt_afe_idx < bookmark) bookmark--;
                afe_insert_at(P, bookmark, clone);
            }
            open_remove_at(P, open_index(P, fmt));
            open_insert_at(P, open_index(P, furthest) + 1, clone);
            if (P->bail) return 0;
        }
    }
    return 0;
}

static int in_body_end(Parser *P, Tok *t) {
    uint16_t f = tagflags(t->tag);
    if (t->tag == TAG_TEMPLATE) return end_template(P);
    if (t->tag == TAG_BODY || t->tag == TAG_HTML) {
        if (!in_scope_tag(P, TAG_BODY, B_BASE)) return RC_DONE;
        P->mode = M_AFTER_BODY;
        return t->tag == TAG_HTML ? RC_REPROCESS : RC_DONE;
    }
    if (f & F_BLOCK_CLOSER) {  /* _BLOCK_CLOSERS | pre */
        if (!in_scope_tag(P, t->tag, B_BASE)) return RC_DONE;
        generate_implied_end(P, -2, 0);
        pop_until_tag(P, t->tag);
        return RC_DONE;
    }
    if (t->tag == TAG_FORM) {
        if (!stack_has_template_anyns(P)) {
            int node = P->form_ptr;
            P->form_ptr = -1;
            if (node < 0 || !in_scope_node(P, node)) return RC_DONE;
            generate_implied_end(P, -2, 0);
            {
                int idx = open_index(P, node);
                if (idx >= 0) open_remove_at(P, idx);
            }
            return RC_DONE;
        }
        if (!in_scope_tag(P, TAG_FORM, B_BASE)) return RC_DONE;
        generate_implied_end(P, -2, 0);
        pop_until_tag(P, TAG_FORM);
        return RC_DONE;
    }
    if (t->tag == TAG_P) {
        if (!in_scope_tag(P, TAG_P, B_BUTTON))
            insert_element_bare(P, TAG_P, 1);
        close_p(P);
        return RC_DONE;
    }
    if (t->tag == TAG_LI) {
        if (!in_scope_tag(P, TAG_LI, B_LIST)) return RC_DONE;
        generate_implied_end(P, TAG_LI, 0);
        pop_until_tag(P, TAG_LI);
        return RC_DONE;
    }
    if (t->tag == TAG_DD || t->tag == TAG_DT) {
        if (!in_scope_tag(P, t->tag, B_BASE)) return RC_DONE;
        generate_implied_end(P, t->tag, 0);
        pop_until_tag(P, t->tag);
        return RC_DONE;
    }
    if (f & F_HEADING) {
        if (!in_scope_mask(P, F_HEADING, B_BASE)) return RC_DONE;
        generate_implied_end(P, -2, 0);
        pop_until_mask(P, F_HEADING);
        return RC_DONE;
    }
    if (f & F_FORMATTING) {
        if (adoption_agency(P, t)) return any_other_end_tag(P, t);
        return RC_DONE;
    }
    if (t->tag == TAG_APPLET || t->tag == TAG_MARQUEE
        || t->tag == TAG_OBJECT) {
        if (!in_scope_tag(P, t->tag, B_BASE)) return RC_DONE;
        generate_implied_end(P, -2, 0);
        pop_until_tag(P, t->tag);
        clear_afe_to_marker(P);
        return RC_DONE;
    }
    if (t->tag == TAG_BR) {
        reconstruct_afe(P);
        insert_element_bare(P, TAG_BR, 0);
        P->frameset_ok = 0;
        return RC_DONE;
    }
    return any_other_end_tag(P, t);
}

/* ---- table modes ---- */

static int mode_in_table(Parser *P, Tok *t) {
    switch (t->kind) {
    case TK_CHARS: {
        int c = cur(P);
        CNode *cn = c >= 0 ? ND(P, c) : NULL;
        if (cn && cn->ns == NS_HTML
            && ((tagflags(cn->tag) & F_TABLE_SECTION)
                || cn->tag == TAG_TEMPLATE)) {
            /* "pending table character tokens": consecutive chars tokens
             * accumulate and are disposed of as ONE unit at the next
             * non-chars token (flush_table_text) — chunk boundaries the
             * tokenizer happens to emit must not affect the tree */
            if (pool_put(&P->ttext_buf, t->data, t->dlen, NULL) < 0)
                P->bail = 1;
            P->ttext_active = 1;
            return RC_DONE;
        }
        P->foster = 1;
        mode_in_body(P, t);
        P->foster = 0;
        return RC_DONE;
    }
    case TK_COMMENT:
        insert_comment(P, t, -1);
        return RC_DONE;
    case TK_DOCTYPE:
        return RC_DONE;
    case TK_START:
        switch (t->tag) {
        case TAG_CAPTION:
            clear_to_table_context(P);
            afe_push_raw(P, -1);
            insert_element_tok(P, t, 1);
            P->mode = M_IN_CAPTION;
            return RC_DONE;
        case TAG_COLGROUP:
            clear_to_table_context(P);
            insert_element_tok(P, t, 1);
            P->mode = M_IN_COLUMN_GROUP;
            return RC_DONE;
        case TAG_COL:
            clear_to_table_context(P);
            insert_element_bare(P, TAG_COLGROUP, 1);
            P->mode = M_IN_COLUMN_GROUP;
            return RC_REPROCESS;
        case TAG_TBODY: case TAG_TFOOT: case TAG_THEAD:
            clear_to_table_context(P);
            insert_element_tok(P, t, 1);
            P->mode = M_IN_TABLE_BODY;
            return RC_DONE;
        case TAG_TD: case TAG_TH: case TAG_TR:
            clear_to_table_context(P);
            insert_element_bare(P, TAG_TBODY, 1);
            P->mode = M_IN_TABLE_BODY;
            return RC_REPROCESS;
        case TAG_TABLE:
            if (!in_table_scope_tag(P, TAG_TABLE)) return RC_DONE;
            pop_until_tag(P, TAG_TABLE);
            reset_insertion_mode(P);
            return RC_REPROCESS;
        case TAG_STYLE: case TAG_SCRIPT: case TAG_TEMPLATE:
            return mode_in_head(P, t);
        case TAG_INPUT: {
            int ai = tok_attr_find(t, "type");
            if (ai >= 0 && eq_lit_ci(t->a[ai].v, t->a[ai].vl, "hidden")) {
                insert_element_tok(P, t, 0);
                return RC_DONE;
            }
            break;  /* anything-else */
        }
        case TAG_FORM:
            if (P->form_ptr < 0 && !stack_has_template_anyns(P)) {
                P->form_ptr = insert_element_tok(P, t, 1);
                P->nopen--;
            }
            return RC_DONE;
        }
        break;
    case TK_END:
        switch (t->tag) {
        case TAG_TABLE:
            if (!in_table_scope_tag(P, TAG_TABLE)) return RC_DONE;
            pop_until_tag(P, TAG_TABLE);
            reset_insertion_mode(P);
            return RC_DONE;
        case TAG_TEMPLATE:
            return end_template(P);
        case TAG_BODY: case TAG_CAPTION: case TAG_COL: case TAG_COLGROUP:
        case TAG_HTML: case TAG_TBODY: case TAG_TD: case TAG_TFOOT:
        case TAG_TH: case TAG_THEAD: case TAG_TR:
            return RC_DONE;
        }
        break;
    default:  /* EOF */
        return mode_in_body(P, t);
    }
    P->foster = 1;
    mode_in_body(P, t);
    P->foster = 0;
    return RC_DONE;
}

static int close_caption(Parser *P, int reprocess) {
    if (!in_table_scope_tag(P, TAG_CAPTION)) return RC_DONE;
    generate_implied_end(P, -2, 0);
    pop_until_tag(P, TAG_CAPTION);
    clear_afe_to_marker(P);
    P->mode = M_IN_TABLE;
    return reprocess;
}

static int mode_in_caption(Parser *P, Tok *t) {
    if (t->kind == TK_END && t->tag == TAG_CAPTION)
        return close_caption(P, 0);
    if ((t->kind == TK_START
         && (t->tag == TAG_CAPTION || t->tag == TAG_COL
             || t->tag == TAG_COLGROUP || t->tag == TAG_TBODY
             || t->tag == TAG_TD || t->tag == TAG_TFOOT || t->tag == TAG_TH
             || t->tag == TAG_THEAD || t->tag == TAG_TR))
        || (t->kind == TK_END && t->tag == TAG_TABLE))
        return close_caption(P, 1);
    if (t->kind == TK_END
        && (t->tag == TAG_BODY || t->tag == TAG_COL || t->tag == TAG_COLGROUP
            || t->tag == TAG_HTML || t->tag == TAG_TBODY || t->tag == TAG_TD
            || t->tag == TAG_TFOOT || t->tag == TAG_TH || t->tag == TAG_THEAD
            || t->tag == TAG_TR))
        return RC_DONE;
    return mode_in_body(P, t);
}

static int mode_in_column_group(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) {
        Py_ssize_t i = ws_prefix(t->data, t->dlen);
        if (i) insert_text(P, t->data, i);
        if (i == t->dlen) return RC_DONE;
        t->data += i; t->dlen -= i;
    } else if (t->kind == TK_COMMENT) {
        insert_comment(P, t, -1); return RC_DONE;
    } else if (t->kind == TK_DOCTYPE) {
        return RC_DONE;
    } else if (t->kind == TK_START) {
        if (t->tag == TAG_HTML) return mode_in_body(P, t);
        if (t->tag == TAG_COL) {
            insert_element_tok(P, t, 0);
            return RC_DONE;
        }
        if (t->tag == TAG_TEMPLATE) return mode_in_head(P, t);
    } else if (t->kind == TK_END) {
        if (t->tag == TAG_COLGROUP) {
            int c = cur(P);
            if (!(c >= 0 && ND(P, c)->tag == TAG_COLGROUP)) return RC_DONE;
            P->nopen--;
            P->mode = M_IN_TABLE;
            return RC_DONE;
        }
        if (t->tag == TAG_COL) return RC_DONE;
        if (t->tag == TAG_TEMPLATE) return mode_in_head(P, t);
    } else {  /* EOF */
        return mode_in_body(P, t);
    }
    {
        int c = cur(P);
        if (!(c >= 0 && ND(P, c)->tag == TAG_COLGROUP)) return RC_DONE;
        P->nopen--;
        P->mode = M_IN_TABLE;
        return RC_REPROCESS;
    }
}

static int mode_in_table_body(Parser *P, Tok *t) {
    if (t->kind == TK_START) {
        if (t->tag == TAG_TR) {
            clear_to_table_body_context(P);
            insert_element_tok(P, t, 1);
            P->mode = M_IN_ROW;
            return RC_DONE;
        }
        if (t->tag == TAG_TH || t->tag == TAG_TD) {
            clear_to_table_body_context(P);
            insert_element_bare(P, TAG_TR, 1);
            P->mode = M_IN_ROW;
            return RC_REPROCESS;
        }
        if (t->tag == TAG_CAPTION || t->tag == TAG_COL
            || t->tag == TAG_COLGROUP || t->tag == TAG_TBODY
            || t->tag == TAG_TFOOT || t->tag == TAG_THEAD) {
            if (!in_table_scope_sections(P)) return RC_DONE;
            clear_to_table_body_context(P);
            P->nopen--;
            P->mode = M_IN_TABLE;
            return RC_REPROCESS;
        }
    }
    if (t->kind == TK_END) {
        if (t->tag == TAG_TBODY || t->tag == TAG_TFOOT
            || t->tag == TAG_THEAD) {
            if (!in_table_scope_tag(P, t->tag)) return RC_DONE;
            clear_to_table_body_context(P);
            P->nopen--;
            P->mode = M_IN_TABLE;
            return RC_DONE;
        }
        if (t->tag == TAG_TABLE) {
            if (!in_table_scope_sections(P)) return RC_DONE;
            clear_to_table_body_context(P);
            P->nopen--;
            P->mode = M_IN_TABLE;
            return RC_REPROCESS;
        }
        if (t->tag == TAG_BODY || t->tag == TAG_CAPTION || t->tag == TAG_COL
            || t->tag == TAG_COLGROUP || t->tag == TAG_HTML
            || t->tag == TAG_TD || t->tag == TAG_TH || t->tag == TAG_TR)
            return RC_DONE;
    }
    return mode_in_table(P, t);
}

static int mode_in_row(Parser *P, Tok *t) {
    if (t->kind == TK_START) {
        if (t->tag == TAG_TH || t->tag == TAG_TD) {
            clear_to_table_row_context(P);
            insert_element_tok(P, t, 1);
            P->mode = M_IN_CELL;
            afe_push_raw(P, -1);
            return RC_DONE;
        }
        if (t->tag == TAG_CAPTION || t->tag == TAG_COL
            || t->tag == TAG_COLGROUP || t->tag == TAG_TBODY
            || t->tag == TAG_TFOOT || t->tag == TAG_THEAD
            || t->tag == TAG_TR) {
            if (!in_table_scope_tag(P, TAG_TR)) return RC_DONE;
            clear_to_table_row_context(P);
            P->nopen--;
            P->mode = M_IN_TABLE_BODY;
            return RC_REPROCESS;
        }
    }
    if (t->kind == TK_END) {
        if (t->tag == TAG_TR) {
            if (!in_table_scope_tag(P, TAG_TR)) return RC_DONE;
            clear_to_table_row_context(P);
            P->nopen--;
            P->mode = M_IN_TABLE_BODY;
            return RC_DONE;
        }
        if (t->tag == TAG_TABLE) {
            if (!in_table_scope_tag(P, TAG_TR)) return RC_DONE;
            clear_to_table_row_context(P);
            P->nopen--;
            P->mode = M_IN_TABLE_BODY;
            return RC_REPROCESS;
        }
        if (t->tag == TAG_TBODY || t->tag == TAG_TFOOT
            || t->tag == TAG_THEAD) {
            if (!in_table_scope_tag(P, t->tag)) return RC_DONE;
            if (!in_table_scope_tag(P, TAG_TR)) return RC_DONE;
            clear_to_table_row_context(P);
            P->nopen--;
            P->mode = M_IN_TABLE_BODY;
            return RC_REPROCESS;
        }
        if (t->tag == TAG_BODY || t->tag == TAG_CAPTION || t->tag == TAG_COL
            || t->tag == TAG_COLGROUP || t->tag == TAG_HTML
            || t->tag == TAG_TD || t->tag == TAG_TH)
            return RC_DONE;
    }
    return mode_in_table(P, t);
}

static void close_cell(Parser *P) {
    generate_implied_end(P, -2, 0);
    pop_until_cell(P);
    clear_afe_to_marker(P);
    P->mode = M_IN_ROW;
}

static int mode_in_cell(Parser *P, Tok *t) {
    if (t->kind == TK_END) {
        if (t->tag == TAG_TD || t->tag == TAG_TH) {
            if (!in_table_scope_tag(P, t->tag)) return RC_DONE;
            generate_implied_end(P, -2, 0);
            pop_until_tag(P, t->tag);
            clear_afe_to_marker(P);
            P->mode = M_IN_ROW;
            return RC_DONE;
        }
        if (t->tag == TAG_BODY || t->tag == TAG_CAPTION || t->tag == TAG_COL
            || t->tag == TAG_COLGROUP || t->tag == TAG_HTML)
            return RC_DONE;
        if (t->tag == TAG_TABLE || t->tag == TAG_TBODY || t->tag == TAG_TFOOT
            || t->tag == TAG_THEAD || t->tag == TAG_TR) {
            if (!in_table_scope_tag(P, t->tag)) return RC_DONE;
            close_cell(P);
            return RC_REPROCESS;
        }
    }
    if (t->kind == TK_START
        && (t->tag == TAG_CAPTION || t->tag == TAG_COL
            || t->tag == TAG_COLGROUP || t->tag == TAG_TBODY
            || t->tag == TAG_TD || t->tag == TAG_TFOOT || t->tag == TAG_TH
            || t->tag == TAG_THEAD || t->tag == TAG_TR)) {
        if (!in_table_scope_cells(P)) return RC_DONE;
        close_cell(P);
        return RC_REPROCESS;
    }
    return mode_in_body(P, t);
}

/* ---- select modes ---- */

static int mode_in_select(Parser *P, Tok *t) {
    switch (t->kind) {
    case TK_CHARS:
        strip_nuls(P, t);
        if (t->dlen) insert_text(P, t->data, t->dlen);
        return RC_DONE;
    case TK_COMMENT:
        insert_comment(P, t, -1);
        return RC_DONE;
    case TK_DOCTYPE:
        return RC_DONE;
    case TK_START:
        switch (t->tag) {
        case TAG_HTML: return mode_in_body(P, t);
        case TAG_OPTION: {
            int c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTION) P->nopen--;
            insert_element_tok(P, t, 1);
            return RC_DONE;
        }
        case TAG_OPTGROUP: {
            int c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTION) P->nopen--;
            c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTGROUP) P->nopen--;
            insert_element_tok(P, t, 1);
            return RC_DONE;
        }
        case TAG_HR: {
            int c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTION) P->nopen--;
            c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTGROUP) P->nopen--;
            insert_element_tok(P, t, 0);
            return RC_DONE;
        }
        case TAG_SELECT:
            if (in_select_scope(P, TAG_SELECT)) {
                pop_until_tag(P, TAG_SELECT);
                reset_insertion_mode(P);
            }
            return RC_DONE;
        case TAG_INPUT: case TAG_KEYGEN: case TAG_TEXTAREA:
            if (!in_select_scope(P, TAG_SELECT)) return RC_DONE;
            pop_until_tag(P, TAG_SELECT);
            reset_insertion_mode(P);
            return RC_REPROCESS;
        case TAG_SCRIPT: case TAG_TEMPLATE:
            return mode_in_head(P, t);
        }
        break;
    case TK_END:
        switch (t->tag) {
        case TAG_OPTGROUP: {
            int c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTION && P->nopen >= 2
                && ND(P, P->open[P->nopen - 2])->tag == TAG_OPTGROUP)
                P->nopen--;
            c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTGROUP) P->nopen--;
            return RC_DONE;
        }
        case TAG_OPTION: {
            int c = cur(P);
            if (c >= 0 && ND(P, c)->tag == TAG_OPTION) P->nopen--;
            return RC_DONE;
        }
        case TAG_SELECT:
            if (!in_select_scope(P, TAG_SELECT)) return RC_DONE;
            pop_until_tag(P, TAG_SELECT);
            reset_insertion_mode(P);
            return RC_DONE;
        case TAG_TEMPLATE:
            return end_template(P);
        }
        break;
    default:  /* EOF */
        return mode_in_body(P, t);
    }
    return RC_DONE;
}

static int is_table_elem_tag(int tag) {
    return tag == TAG_CAPTION || tag == TAG_TABLE || tag == TAG_TBODY
        || tag == TAG_TFOOT || tag == TAG_THEAD || tag == TAG_TR
        || tag == TAG_TD || tag == TAG_TH;
}

static int mode_in_select_in_table(Parser *P, Tok *t) {
    if (t->kind == TK_START && is_table_elem_tag(t->tag)) {
        pop_until_tag(P, TAG_SELECT);
        reset_insertion_mode(P);
        return RC_REPROCESS;
    }
    if (t->kind == TK_END && is_table_elem_tag(t->tag)) {
        if (!in_table_scope_tag(P, t->tag)) return RC_DONE;
        pop_until_tag(P, TAG_SELECT);
        reset_insertion_mode(P);
        return RC_REPROCESS;
    }
    return mode_in_select(P, t);
}

/* ---- after body / after after body ---- */

static int mode_after_body(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) {
        if (all_ws(t->data, t->dlen)) return mode_in_body(P, t);
        {
            Py_ssize_t i = ws_prefix(t->data, t->dlen);
            if (i) {
                Tok ws = *t;
                ws.dlen = i;
                mode_in_body(P, &ws);
                t->data += i; t->dlen -= i;
            }
        }
        P->mode = M_IN_BODY;
        return RC_REPROCESS;
    }
    if (t->kind == TK_COMMENT) {
        insert_comment(P, t, P->open[0]);
        return RC_DONE;
    }
    if (t->kind == TK_DOCTYPE) return RC_DONE;
    if (t->kind == TK_START && t->tag == TAG_HTML) return mode_in_body(P, t);
    if (t->kind == TK_END && t->tag == TAG_HTML) {
        P->mode = M_AFTER_AFTER_BODY;
        return RC_DONE;
    }
    if (t->kind == TK_EOF) { P->stopped = 1; return RC_DONE; }
    P->mode = M_IN_BODY;
    return RC_REPROCESS;
}

static int mode_after_after_body(Parser *P, Tok *t) {
    if (t->kind == TK_COMMENT) { insert_comment(P, t, 0); return RC_DONE; }
    if (t->kind == TK_DOCTYPE) return mode_in_body(P, t);
    if (t->kind == TK_CHARS) {
        if (all_ws(t->data, t->dlen)) return mode_in_body(P, t);
        {
            Py_ssize_t i = ws_prefix(t->data, t->dlen);
            if (i) {
                Tok ws = *t;
                ws.dlen = i;
                mode_in_body(P, &ws);
                t->data += i; t->dlen -= i;
            }
        }
        P->mode = M_IN_BODY;
        return RC_REPROCESS;
    }
    if (t->kind == TK_START && t->tag == TAG_HTML) return mode_in_body(P, t);
    if (t->kind == TK_EOF) { P->stopped = 1; return RC_DONE; }
    P->mode = M_IN_BODY;
    return RC_REPROCESS;
}

/* ---- frameset modes ---- */

static void insert_ws_only(Parser *P, Tok *t, int via_in_body) {
    /* collect the ws chars of t->data and insert (frameset chars rules) */
    P->tokp.len = 0;
    Py_ssize_t i;
    for (i = 0; i < t->dlen; i++) {
        uint8_t c = t->data[i];
        if (c == ' ' || c == '\t' || c == '\n' || c == 0x0c || c == '\r') {
            if (pool_putc(&P->tokp, c) < 0) P->bail = 1;
        }
    }
    if (P->tokp.len == 0) return;
    if (via_in_body) {
        Tok ws;
        memset(&ws, 0, sizeof(ws));
        ws.kind = TK_CHARS;
        ws.data = P->tokp.buf;
        ws.dlen = (Py_ssize_t)P->tokp.len;
        mode_in_body(P, &ws);
    } else {
        insert_text(P, P->tokp.buf, (Py_ssize_t)P->tokp.len);
    }
}

static int mode_in_frameset(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) { insert_ws_only(P, t, 0); return RC_DONE; }
    if (t->kind == TK_COMMENT) { insert_comment(P, t, -1); return RC_DONE; }
    if (t->kind == TK_DOCTYPE) return RC_DONE;
    if (t->kind == TK_START) {
        if (t->tag == TAG_HTML) return mode_in_body(P, t);
        if (t->tag == TAG_FRAMESET) {
            insert_element_tok(P, t, 1);
            return RC_DONE;
        }
        if (t->tag == TAG_FRAME) {
            insert_element_tok(P, t, 0);
            return RC_DONE;
        }
        if (t->tag == TAG_NOFRAMES) return mode_in_head(P, t);
    }
    if (t->kind == TK_END && t->tag == TAG_FRAMESET) {
        int c = cur(P);
        if (c >= 0 && ND(P, c)->tag == TAG_HTML) return RC_DONE;
        P->nopen--;
        c = cur(P);
        if (c >= 0 && ND(P, c)->tag != TAG_FRAMESET)
            P->mode = M_AFTER_FRAMESET;
        return RC_DONE;
    }
    if (t->kind == TK_EOF) { P->stopped = 1; return RC_DONE; }
    return RC_DONE;
}

static int mode_after_frameset(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) { insert_ws_only(P, t, 0); return RC_DONE; }
    if (t->kind == TK_COMMENT) { insert_comment(P, t, -1); return RC_DONE; }
    if (t->kind == TK_DOCTYPE) return RC_DONE;
    if (t->kind == TK_START) {
        if (t->tag == TAG_HTML) return mode_in_body(P, t);
        if (t->tag == TAG_NOFRAMES) return mode_in_head(P, t);
    }
    if (t->kind == TK_END && t->tag == TAG_HTML) {
        P->mode = M_AFTER_AFTER_FRAMESET;
        return RC_DONE;
    }
    if (t->kind == TK_EOF) { P->stopped = 1; return RC_DONE; }
    return RC_DONE;
}

static int mode_after_after_frameset(Parser *P, Tok *t) {
    if (t->kind == TK_COMMENT) { insert_comment(P, t, 0); return RC_DONE; }
    if (t->kind == TK_DOCTYPE) return mode_in_body(P, t);
    if (t->kind == TK_CHARS) { insert_ws_only(P, t, 1); return RC_DONE; }
    if (t->kind == TK_START) {
        if (t->tag == TAG_HTML) return mode_in_body(P, t);
        if (t->tag == TAG_NOFRAMES) return mode_in_head(P, t);
    }
    if (t->kind == TK_EOF) { P->stopped = 1; return RC_DONE; }
    return RC_DONE;
}

/* ---- foreign content ---- */

typedef int (*ModeFn)(Parser *, Tok *);
static ModeFn MODE_DISPATCH[22];

static void process_html(Parser *P, Tok *t) {
    for (;;) {
        int res = MODE_DISPATCH[P->mode](P, t);
        if (P->bail || res == RC_DONE) return;
    }
}

static void replace_nuls_fffd(Parser *P, Tok *t) {
    if (!memchr(t->data, 0, t->dlen)) return;
    P->tokp.len = 0;
    put_repl(P, &P->tokp, t->data, t->dlen);
    t->data = P->tokp.buf;
    t->dlen = (Py_ssize_t)P->tokp.len;
}

static void process_foreign(Parser *P, Tok *t) {
    if (t->kind == TK_CHARS) {
        replace_nuls_fffd(P, t);
        insert_text(P, t->data, t->dlen);
        if (P->frameset_ok && !all_ws(t->data, t->dlen))
            P->frameset_ok = 0;
        return;
    }
    if (t->kind == TK_COMMENT) { insert_comment(P, t, -1); return; }
    if (t->kind == TK_DOCTYPE) return;
    if (t->kind == TK_START) {
        int breakout = (tagflags(t->tag) & F_BREAKOUT) != 0;
        if (!breakout && t->tag == TAG_FONT) {
            if (tok_attr_find(t, "color") >= 0
                || tok_attr_find(t, "face") >= 0
                || tok_attr_find(t, "size") >= 0)
                breakout = 1;
        }
        if (breakout) {
            for (;;) {
                int c = cur(P);
                if (c < 0 || ND(P, c)->ns == NS_HTML
                    || is_mathml_text_ip(P, c) || is_html_ip(P, c))
                    break;
                if (P->nopen <= 1) break;
                P->nopen--;
            }
            {
                int acn = cur(P);
                if (!(acn >= 0 && ND(P, acn)->ns != NS_HTML
                      && !is_mathml_text_ip(P, acn) && !is_html_ip(P, acn))) {
                    process_token(P, t);
                    return;
                }
            }
            /* fall through: ordinary foreign start tag */
        }
        {
            int acn = cur(P);
            int ns = acn >= 0 ? ND(P, acn)->ns : NS_HTML;
            int el = elem_from_tok(P, t, ns, ns == NS_SVG ? 1 : 0);
            insert_node_at_place(P, el, -1);
            if (!t->self_closing) open_push(P, el);
        }
        return;
    }
    if (t->kind == TK_END) {
        /* generic ancestor loop; lowercase tag-name compare because foreign
         * tags keep their adjusted case (reference HTMLParser.m:2447-2467) */
        int i;
        for (i = P->nopen - 1; i > 0; i--) {
            int el = P->open[i];
            CNode *nd = ND(P, el);
            const uint8_t *nm; Py_ssize_t nl;
            if (nd->tag >= 0) {
                nm = (const uint8_t *)TAG_NAMES[nd->tag];
                nl = (Py_ssize_t)strlen(TAG_NAMES[nd->tag]);
            } else {
                nm = P->text.buf + nd->name_off;
                nl = nd->name_len;
            }
            {
                int match = (nl == t->nlen);
                if (match) {
                    Py_ssize_t k;
                    for (k = 0; k < nl; k++) {
                        if (lo(nm[k]) != t->name[k]) { match = 0; break; }
                    }
                }
                if (match) {
                    while (P->open[P->nopen - 1] != el) P->nopen--;
                    P->nopen--;
                    return;
                }
            }
            if (ND(P, P->open[i - 1])->ns == NS_HTML) break;
        }
        process_html(P, t);
        return;
    }
    /* EOF never routed here */
}

/* dispose of the pending table character tokens as one unit (the spec's
 * in-table-text "anything else" step; mirror of the Python treebuilder's
 * _flush_table_text) */
static void flush_table_text(Parser *P) {
    uint8_t *d = P->ttext_buf.buf;
    size_t len = P->ttext_buf.len, w = 0, i;
    int allws = 1;
    P->ttext_active = 0;
    for (i = 0; i < len; i++) {
        uint8_t c = d[i];
        if (c == 0) continue;           /* NUL: parse error, ignore */
        if (allws && c != ' ' && c != '\t' && c != '\n' && c != '\f'
            && c != '\r')
            allws = 0;
        d[w++] = c;
    }
    len = w;
    if (len == 0) { P->ttext_buf.len = 0; return; }
    if (allws) {
        insert_text(P, d, (Py_ssize_t)len);
    } else {
        Tok ct;
        memset(&ct, 0, sizeof(ct));
        ct.kind = TK_CHARS;
        ct.data = d;
        ct.dlen = (Py_ssize_t)len;
        P->foster = 1;
        mode_in_body(P, &ct);
        P->foster = 0;
    }
    P->ttext_buf.len = 0;
}

static void process_token(Parser *P, Tok *t) {
    if (P->ttext_active && t->kind != TK_CHARS)
        flush_table_text(P);
    if (t->kind == TK_CHARS && P->ignore_next_lf) {
        P->ignore_next_lf = 0;
        if (t->dlen && t->data[0] == '\n') {
            t->data++;
            t->dlen--;
            if (t->dlen == 0) return;
        }
    } else {
        P->ignore_next_lf = 0;
    }
    if (!P->saw_foreign) {
        process_html(P, t);
        return;
    }
    {
        int acn = cur(P);
        int use_html = 1;
        if (acn >= 0 && ND(P, acn)->ns != NS_HTML) {
            use_html = 0;
            if (t->kind == TK_CHARS) {
                if (is_mathml_text_ip(P, acn) || is_html_ip(P, acn))
                    use_html = 1;
            } else if (t->kind == TK_START) {
                if (is_mathml_text_ip(P, acn)
                    && t->tag != TAG_MGLYPH && t->tag != TAG_MALIGNMARK)
                    use_html = 1;
                else if (ND(P, acn)->ns == NS_MATHML
                         && ND(P, acn)->tag == TAG_ANNOTATION_XML
                         && t->tag == TAG_SVG)
                    use_html = 1;
                else if (is_html_ip(P, acn))
                    use_html = 1;
            } else if (t->kind == TK_EOF) {
                use_html = 1;
            }
        }
        if (use_html) process_html(P, t);
        else process_foreign(P, t);
    }
}

static void init_dispatch(void) {
    MODE_DISPATCH[M_INITIAL] = mode_initial;
    MODE_DISPATCH[M_BEFORE_HTML] = mode_before_html;
    MODE_DISPATCH[M_BEFORE_HEAD] = mode_before_head;
    MODE_DISPATCH[M_IN_HEAD] = mode_in_head;
    MODE_DISPATCH[M_IN_HEAD_NOSCRIPT] = mode_in_head_noscript;
    MODE_DISPATCH[M_AFTER_HEAD] = mode_after_head;
    MODE_DISPATCH[M_IN_BODY] = mode_in_body;
    MODE_DISPATCH[M_TEXT] = mode_text;
    MODE_DISPATCH[M_IN_TABLE] = mode_in_table;
    MODE_DISPATCH[M_IN_CAPTION] = mode_in_caption;
    MODE_DISPATCH[M_IN_COLUMN_GROUP] = mode_in_column_group;
    MODE_DISPATCH[M_IN_TABLE_BODY] = mode_in_table_body;
    MODE_DISPATCH[M_IN_ROW] = mode_in_row;
    MODE_DISPATCH[M_IN_CELL] = mode_in_cell;
    MODE_DISPATCH[M_IN_SELECT] = mode_in_select;
    MODE_DISPATCH[M_IN_SELECT_IN_TABLE] = mode_in_select_in_table;
    MODE_DISPATCH[M_AFTER_BODY] = mode_after_body;
    MODE_DISPATCH[M_IN_FRAMESET] = mode_in_frameset;
    MODE_DISPATCH[M_AFTER_FRAMESET] = mode_after_frameset;
    MODE_DISPATCH[M_AFTER_AFTER_BODY] = mode_after_after_body;
    MODE_DISPATCH[M_AFTER_AFTER_FRAMESET] = mode_after_after_frameset;
    MODE_DISPATCH[M_IN_TEMPLATE] = mode_in_template;
}

/* ====================================================== DOM materialization */

static PyObject *g_Document, *g_Element, *g_Text, *g_Comment, *g_Doctype;
static PyObject *g_ns[3];
static PyObject *g_quirks[3];
static PyObject *g_tagpy[N_TAGS];
static PyObject *g_attr_intern;
static PyObject *g_s_parent, *g_s_children, *g_s_quirks_mode;
static PyObject *g_empty_str;

static PyObject *tag_pyname(Parser *P, CNode *nd) {
    if (nd->tag >= 0) {
        PyObject *o = g_tagpy[nd->tag];
        if (!o) {
            o = PyUnicode_FromString(TAG_NAMES[nd->tag]);
            if (!o) return NULL;
            PyUnicode_InternInPlace(&o);
            g_tagpy[nd->tag] = o;
        }
        Py_INCREF(o);
        return o;
    }
    return PyUnicode_DecodeUTF8((const char *)P->text.buf + nd->name_off,
                                nd->name_len, NULL);
}

static PyObject *attrs_pydict(Parser *P, CNode *nd) {
    PyObject *d = PyDict_New();
    if (!d) return NULL;
    int i;
    for (i = 0; i < nd->attr_count; i++) {
        CAttr *a = &P->attrs[nd->attr_start + i];
        PyObject *k = PyUnicode_DecodeUTF8((const char *)P->ab.buf + a->noff,
                                           a->nlen, NULL);
        if (!k) { Py_DECREF(d); return NULL; }
        PyObject *cached = PyDict_SetDefault(g_attr_intern, k, k);
        if (!cached) { Py_DECREF(k); Py_DECREF(d); return NULL; }
        Py_INCREF(cached);
        Py_DECREF(k);
        PyObject *v = PyUnicode_DecodeUTF8((const char *)P->ab.buf + a->voff,
                                           a->vlen, NULL);
        if (!v) { Py_DECREF(cached); Py_DECREF(d); return NULL; }
        if (PyDict_SetItem(d, cached, v) < 0) {
            Py_DECREF(cached); Py_DECREF(v); Py_DECREF(d); return NULL;
        }
        Py_DECREF(cached);
        Py_DECREF(v);
    }
    return d;
}

static PyObject *text_pystr(Parser *P, uint32_t off, uint32_t len) {
    if (len == 0) { Py_INCREF(g_empty_str); return g_empty_str; }
    return PyUnicode_DecodeUTF8((const char *)P->text.buf + off, len, NULL);
}

static PyObject *make_pynode(Parser *P, CNode *nd) {
    switch (nd->kind) {
    case K_DOC:
        return PyObject_CallNoArgs(g_Document);
    case K_ELEM: {
        PyObject *tag = tag_pyname(P, nd);
        if (!tag) return NULL;
        PyObject *attrs = attrs_pydict(P, nd);
        if (!attrs) { Py_DECREF(tag); return NULL; }
        PyObject *el = PyObject_CallFunctionObjArgs(
            g_Element, tag, attrs, g_ns[nd->ns], NULL);
        Py_DECREF(tag);
        Py_DECREF(attrs);
        return el;
    }
    case K_TEXT: {
        PyObject *data = text_pystr(P, nd->data_off, nd->data_len);
        if (!data) return NULL;
        PyObject *o = PyObject_CallFunctionObjArgs(g_Text, data, NULL);
        Py_DECREF(data);
        return o;
    }
    case K_COMMENT: {
        PyObject *data = text_pystr(P, nd->data_off, nd->data_len);
        if (!data) return NULL;
        PyObject *o = PyObject_CallFunctionObjArgs(g_Comment, data, NULL);
        Py_DECREF(data);
        return o;
    }
    default: {  /* K_DOCTYPE */
        PyObject *name = text_pystr(P, (uint32_t)nd->name_off,
                                    (uint32_t)nd->name_len);
        if (!name) return NULL;
        PyObject *pub = text_pystr(P, nd->pub_off, nd->pub_len);
        if (!pub) { Py_DECREF(name); return NULL; }
        PyObject *sys = text_pystr(P, nd->sys_off, nd->sys_len);
        if (!sys) { Py_DECREF(name); Py_DECREF(pub); return NULL; }
        PyObject *o = PyObject_CallFunctionObjArgs(g_Doctype, name, pub, sys,
                                                   NULL);
        Py_DECREF(name);
        Py_DECREF(pub);
        Py_DECREF(sys);
        return o;
    }
    }
}

/* build the Python DOM from the C tree; returns the Document (new ref) */
static PyObject *build_dom(Parser *P) {
    int n = P->nnodes;
    PyObject **objs = (PyObject **)calloc(n, sizeof(PyObject *));
    PyObject **kids = (PyObject **)calloc(n, sizeof(PyObject *));
    int *stack = (int *)malloc(n * sizeof(int));
    PyObject *result = NULL;
    if (!objs || !kids || !stack) goto done;
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0) {
        int idx = stack[--sp];
        CNode *nd = ND(P, idx);
        PyObject *obj = make_pynode(P, nd);
        if (!obj) goto done;
        objs[idx] = obj;
        if (nd->parent >= 0) {
            PyObject *parent = objs[nd->parent];
            PyObject *klist = kids[nd->parent];
            if (PyObject_SetAttr(obj, g_s_parent, parent) < 0) goto done;
            if (PyList_Append(klist, obj) < 0) goto done;
        }
        if (nd->first_child >= 0) {
            PyObject *klist = PyObject_GetAttr(obj, g_s_children);
            if (!klist || !PyList_Check(klist)) {
                Py_XDECREF(klist);
                goto done;
            }
            kids[idx] = klist;
            /* push children reversed so pops come in document order */
            {
                int c = nd->last_child;
                while (c >= 0) {
                    stack[sp++] = c;
                    c = ND(P, c)->prev_sib;
                }
            }
        }
    }
    if (PyObject_SetAttr(objs[0], g_s_quirks_mode, g_quirks[P->quirks]) < 0)
        goto done;
    result = objs[0];
    Py_INCREF(result);
done:
    if (objs) {
        int i;
        for (i = 0; i < n; i++) Py_XDECREF(objs[i]);
    }
    if (kids) {
        int i;
        for (i = 0; i < n; i++) Py_XDECREF(kids[i]);
    }
    free(objs); free(kids); free(stack);
    return result;
}

/* ============================================================ module glue */

static Parser g_parser;

static void parser_reset(Parser *P, const uint8_t *s, Py_ssize_t n,
                         int scripting) {
    P->s = s; P->n = n;
    P->text.len = 0; P->ab.len = 0; P->tokp.len = 0; P->chp.len = 0;
    P->ttext_buf.len = 0; P->ttext_active = 0;
    P->nattrs = 0; P->nnodes = 0; P->nopen = 0; P->nafe = 0;
    P->mode = M_INITIAL; P->original_mode = M_INITIAL;
    P->ntmodes = 0;
    P->head_ptr = -1; P->form_ptr = -1;
    P->frameset_ok = 1; P->ignore_next_lf = 0;
    P->scripting = scripting;
    P->saw_foreign = 0; P->stopped = 0; P->foster = 0;
    P->quirks = QM_NO; P->bail = 0;
    P->tstate = S_DATA; P->pos = 0;
    P->last_start_len = 0;
    P->pending_eof = 0; P->has_pending = 0;
}

/* run tokenize + tree construction; 0 = ok, 1 = bail.
 * On ok the caller must free(P->norm) when done with the arena. */
static int run_parse(Parser *P, const char *u8, Py_ssize_t n, int scripting) {
    parser_reset(P, (const uint8_t *)u8, n, scripting);

    /* input preprocessing: \r\n -> \n, \r -> \n */
    if (memchr(u8, '\r', n)) {
        uint8_t *norm = (uint8_t *)malloc(n > 0 ? n : 1);
        if (!norm) return 1;
        Py_ssize_t i, o = 0;
        for (i = 0; i < n; i++) {
            uint8_t c = (uint8_t)u8[i];
            if (c == '\r') {
                norm[o++] = '\n';
                if (i + 1 < n && u8[i + 1] == '\n') i++;
            } else {
                norm[o++] = c;
            }
        }
        P->norm = norm;
        P->s = norm;
        P->n = o;
        n = o;
    } else {
        P->norm = NULL;
    }

    /* pre-reserve token pools so token payload pointers stay stable */
    if (pool_reserve(&P->tokp, (size_t)(3 * n + 64)) < 0
        || pool_reserve(&P->chp, (size_t)(3 * n + 64)) < 0) {
        free(P->norm); P->norm = NULL;
        return 1;
    }

    node_new(P, K_DOC);  /* node 0 */

    {
        Tok t;
        for (;;) {
            memset(&t, 0, sizeof(t));
            next_token(P, &t);
            if (P->bail) break;
            process_token(P, &t);
            if (P->bail || P->stopped || t.kind == TK_EOF) break;
        }
    }

    if (P->bail) {
        free(P->norm); P->norm = NULL;
        return 1;
    }
    return 0;
}

static PyObject *cparse(PyObject *self, PyObject *args, PyObject *kwargs) {
    static char *kwlist[] = {"html", "scripting", NULL};
    PyObject *src;
    int scripting = 1;
    if (!PyArg_ParseTupleAndKeywords(args, kwargs, "U|p", kwlist, &src,
                                     &scripting))
        return NULL;
    Py_ssize_t n;
    const char *u8 = PyUnicode_AsUTF8AndSize(src, &n);
    if (!u8) { PyErr_Clear(); Py_RETURN_NONE; }

    Parser *P = &g_parser;
    if (run_parse(P, u8, n, scripting)) Py_RETURN_NONE;
    {
        PyObject *doc = build_dom(P);
        free(P->norm); P->norm = NULL;
        if (!doc) {
            if (PyErr_Occurred()) return NULL;
            Py_RETURN_NONE;
        }
        return doc;
    }
}

/* ===================================================== extraction head
 *
 * extract() runs the Extractor fast path (kernel/extract.py:
 * strip_boilerplate + text_of) entirely on the C arena — no Python DOM is
 * materialized. Semantics are kept byte-identical to the Python
 * implementation; parity is enforced by tests/test_cparser.py and the
 * cparse soak. Unsupported configs (compiled complex selectors) never
 * reach here — the Python Extractor only calls extract() for the
 * set-bucketed rule subset. */

/* Python str whitespace (str.isspace() == re \s for str — verified equal) */
static inline int uws(uint32_t c) {
    return (c >= 0x09 && c <= 0x0D) || (c >= 0x1C && c <= 0x20)
        || c == 0x85 || c == 0xA0 || c == 0x1680
        || (c >= 0x2000 && c <= 0x200A) || c == 0x2028 || c == 0x2029
        || c == 0x202F || c == 0x205F || c == 0x3000;
}

/* decode one codepoint; input is valid UTF-8 by construction (pool bytes
 * came from a Python str) */
static inline uint32_t u8_cp(const uint8_t *p, int *adv) {
    uint8_t b = p[0];
    if (b < 0x80) { *adv = 1; return b; }
    if (b < 0xE0) { *adv = 2; return ((uint32_t)(b & 0x1F) << 6) | (p[1] & 0x3F); }
    if (b < 0xF0) {
        *adv = 3;
        return ((uint32_t)(b & 0x0F) << 12) | ((uint32_t)(p[1] & 0x3F) << 6)
             | (p[2] & 0x3F);
    }
    *adv = 4;
    return ((uint32_t)(b & 0x07) << 18) | ((uint32_t)(p[1] & 0x3F) << 12)
         | ((uint32_t)(p[2] & 0x3F) << 6) | (p[3] & 0x3F);
}

/* codepoint count == Python len(str) for the pool's UTF-8 bytes */
static int64_t cp_count(const uint8_t *p, uint32_t len) {
    int64_t k = 0;
    uint32_t i;
    for (i = 0; i < len; i++)
        if ((p[i] & 0xC0) != 0x80) k++;
    return k;
}

static const uint8_t *xnode_name(Parser *P, CNode *nd, Py_ssize_t *len) {
    if (nd->tag >= 0) {
        const char *t = TAG_NAMES[nd->tag];
        *len = (Py_ssize_t)strlen(t);
        return (const uint8_t *)t;
    }
    *len = nd->name_len;
    return P->text.buf + nd->name_off;
}

#define MAX_RM 96
typedef struct {
    const uint8_t *s[MAX_RM]; Py_ssize_t l[MAX_RM]; int n;
} StrSet;

typedef struct {
    StrSet tags, cls, ids;
    const uint8_t *an[MAX_RM]; Py_ssize_t anl[MAX_RM];
    const uint8_t *av[MAX_RM]; Py_ssize_t avl[MAX_RM];  /* avl -1 = bare */
    int nat;
    uint8_t blk[N_TAGS];               /* block-tag membership by tag id */
    double max_ld, min_td;
    long min_bc;
    int collapse;
} XCfg;

static int strset_in(const StrSet *S, const uint8_t *p, Py_ssize_t len) {
    int i;
    for (i = 0; i < S->n; i++)
        if (S->l[i] == len && memcmp(S->s[i], p, (size_t)len) == 0) return 1;
    return 0;
}

/* fill a StrSet from a tuple of str; -1 on unsupported shape */
static int strset_load(StrSet *S, PyObject *tup) {
    if (!PyTuple_Check(tup)) return -1;
    Py_ssize_t n = PyTuple_GET_SIZE(tup), i;
    if (n > MAX_RM) return -1;
    S->n = (int)n;
    for (i = 0; i < n; i++) {
        PyObject *o = PyTuple_GET_ITEM(tup, i);
        if (!PyUnicode_Check(o)) return -1;
        S->s[i] = (const uint8_t *)PyUnicode_AsUTF8AndSize(o, &S->l[i]);
        if (!S->s[i]) return -1;
    }
    return 0;
}

/* find attr by exact name; returns index or -1 (first match — the
 * tokenizer already dropped duplicate attribute names) */
static int attr_find(Parser *P, CNode *nd, const uint8_t *name,
                     Py_ssize_t nlen) {
    int i;
    for (i = 0; i < nd->attr_count; i++) {
        CAttr *a = &P->attrs[nd->attr_start + i];
        if (a->nlen == (uint32_t)nlen
            && memcmp(P->ab.buf + a->noff, name, (size_t)nlen) == 0)
            return nd->attr_start + i;
    }
    return -1;
}

/* does the element match the removal rule set? (kernel/extract.py:105-135:
 * tag set, id set, class-token set, [attr] / [attr=value] rules) */
static int rules_match(Parser *P, CNode *nd, XCfg *X) {
    Py_ssize_t nl;
    const uint8_t *nm = xnode_name(P, nd, &nl);
    if (strset_in(&X->tags, nm, nl)) return 1;
    if (nd->attr_count == 0) return 0;
    if (X->ids.n) {
        int ai = attr_find(P, nd, (const uint8_t *)"id", 2);
        if (ai >= 0) {
            CAttr *a = &P->attrs[ai];
            if (strset_in(&X->ids, P->ab.buf + a->voff, a->vlen)) return 1;
        }
    }
    if (X->cls.n) {
        int ai = attr_find(P, nd, (const uint8_t *)"class", 5);
        if (ai >= 0) {
            CAttr *a = &P->attrs[ai];
            const uint8_t *v = P->ab.buf + a->voff;
            uint32_t len = a->vlen, i = 0;
            while (i < len) {                     /* str.split() tokens */
                int adv;
                while (i < len && uws(u8_cp(v + i, &adv))) i += adv;
                uint32_t start = i;
                while (i < len && !uws(u8_cp(v + i, &adv))) i += adv;
                if (i > start
                    && strset_in(&X->cls, v + start, (Py_ssize_t)(i - start)))
                    return 1;
            }
        }
    }
    {
        int r;
        for (r = 0; r < X->nat; r++) {
            int ai = attr_find(P, nd, X->an[r], X->anl[r]);
            if (ai < 0) continue;
            if (X->avl[r] < 0) return 1;
            CAttr *a = &P->attrs[ai];
            if (a->vlen == (uint32_t)X->avl[r]
                && memcmp(P->ab.buf + a->voff, X->av[r],
                          (size_t)X->avl[r]) == 0)
                return 1;
        }
    }
    return 0;
}

/* doc.body_element or doc.root_element or doc (dom.py:188-201), skipping
 * doomed nodes when re-resolving after stripping */
static int resolve_root(Parser *P, const uint8_t *doomed) {
    int html = -1, c;
    for (c = ND(P, 0)->first_child; c >= 0; c = ND(P, c)->next_sib) {
        if (ND(P, c)->kind == K_ELEM && !(doomed && doomed[c])) {
            html = c;
            break;
        }
    }
    if (html >= 0 && ND(P, html)->tag == TAG_HTML) {
        for (c = ND(P, html)->first_child; c >= 0; c = ND(P, c)->next_sib) {
            CNode *k = ND(P, c);
            if (k->kind == K_ELEM && !(doomed && doomed[c])
                && (k->tag == TAG_BODY || k->tag == TAG_FRAMESET))
                return c;
        }
    }
    return html >= 0 ? html : 0;
}

static XCfg g_xcfg;
static PyObject *g_xcfg_key[5];
static int g_xcfg_valid = 0;

/* Config cache: extract() is called once per document with the SAME config
 * tuple objects (Extractor._cargs is built once per instance), so reloading
 * the rule sets per call is pure fixed overhead (~1-2 us of a ~12 us/doc
 * budget on 1 KB docs). Key the cached XCfg on the identity of the five
 * config objects (strong refs keep the cached UTF-8 pointers alive) plus
 * the scalar knobs. Returns 0 ok, 1 unsupported-shape (caller bails). */
static int xcfg_ensure(PyObject *t_tags, PyObject *t_cls, PyObject *t_ids,
                       PyObject *t_attrs, PyObject *t_blk, double max_ld,
                       long min_bc, double min_td, int collapse) {
    XCfg *Xc = &g_xcfg;
    if (g_xcfg_valid
        && g_xcfg_key[0] == t_tags && g_xcfg_key[1] == t_cls
        && g_xcfg_key[2] == t_ids && g_xcfg_key[3] == t_attrs
        && g_xcfg_key[4] == t_blk
        && g_xcfg.max_ld == max_ld && g_xcfg.min_td == min_td
        && g_xcfg.min_bc == min_bc && g_xcfg.collapse == collapse)
        return 0;
    g_xcfg_valid = 0;
    memset(Xc, 0, sizeof(*Xc));
    Xc->max_ld = max_ld; Xc->min_td = min_td; Xc->min_bc = min_bc;
    Xc->collapse = collapse;
    if (strset_load(&Xc->tags, t_tags) < 0
        || strset_load(&Xc->cls, t_cls) < 0
        || strset_load(&Xc->ids, t_ids) < 0)
        return 1;
    if (!PyTuple_Check(t_attrs) || PyTuple_GET_SIZE(t_attrs) > MAX_RM)
        return 1;
    {
        Py_ssize_t i, n = PyTuple_GET_SIZE(t_attrs);
        Xc->nat = (int)n;
        for (i = 0; i < n; i++) {
            PyObject *pair = PyTuple_GET_ITEM(t_attrs, i);
            if (!PyTuple_Check(pair) || PyTuple_GET_SIZE(pair) != 2)
                return 1;
            PyObject *an = PyTuple_GET_ITEM(pair, 0);
            PyObject *av = PyTuple_GET_ITEM(pair, 1);
            if (!PyUnicode_Check(an)) return 1;
            Xc->an[i] = (const uint8_t *)PyUnicode_AsUTF8AndSize(
                an, &Xc->anl[i]);
            if (!Xc->an[i]) return 1;
            if (av == Py_None) {
                Xc->av[i] = NULL; Xc->avl[i] = -1;
            } else {
                if (!PyUnicode_Check(av)) return 1;
                Xc->av[i] = (const uint8_t *)PyUnicode_AsUTF8AndSize(
                    av, &Xc->avl[i]);
                if (!Xc->av[i]) return 1;
            }
        }
    }
    if (!PyTuple_Check(t_blk)) return 1;
    {
        Py_ssize_t i, n = PyTuple_GET_SIZE(t_blk);
        for (i = 0; i < n; i++) {
            PyObject *o = PyTuple_GET_ITEM(t_blk, i);
            Py_ssize_t bl;
            const char *bs;
            if (!PyUnicode_Check(o)) return 1;
            bs = PyUnicode_AsUTF8AndSize(o, &bl);
            if (!bs) return 1;
            {
                int tid = tag_lookup((const uint8_t *)bs, bl);
                if (tid < 0) return 1;  /* block tags are all known */
                Xc->blk[tid] = 1;
            }
        }
    }
    {
        PyObject *newk[5] = { t_tags, t_cls, t_ids, t_attrs, t_blk };
        int i;
        for (i = 0; i < 5; i++) {
            Py_INCREF(newk[i]);
            Py_XDECREF(g_xcfg_key[i]);
            g_xcfg_key[i] = newk[i];
        }
    }
    g_xcfg_valid = 1;
    return 0;
}

/* Per-document extraction core: parse src, apply the cached rule set
 * (g_xcfg must be valid), and APPEND the extracted text to out. Returns
 * 0 on success, 1 on parse bail (out unchanged), -1 on OOM. This is the
 * unit shared by extract() (one doc -> str) and extract_many() (a batch
 * -> one packed buffer, no per-doc PyUnicode allocation). */
/* Grow-only scratch arena for extract_one_raw's per-doc work arrays: one
 * allocation reused across every doc in a batch instead of 7 malloc/free
 * pairs per document (87k allocator round trips per 12.5k-doc row group).
 * Safe as a global: extraction runs under the GIL, one doc at a time. */
static uint8_t *g_xscratch = NULL;
static size_t g_xscratch_cap = 0;

static int extract_one_raw(const char *u8, Py_ssize_t n8, int scripting,
                           Pool *out) {
    XCfg *Xc = &g_xcfg;
    Parser *P = &g_parser;
    if (run_parse(P, u8, n8, scripting)) return 1;

    int rc = -1;
    size_t base = out->len;   /* this doc's region: [base, out->len) */
    int n = P->nnodes;
    /* layout (alignment-descending): tl ls ec | pre stk | doomed inreg */
    size_t need = (size_t)n * (3 * sizeof(int64_t) + 2 * sizeof(int) + 2);
    if (need > g_xscratch_cap) {
        size_t nc = g_xscratch_cap ? g_xscratch_cap * 2 : 65536;
        while (nc < need) nc *= 2;
        uint8_t *nb = (uint8_t *)realloc(g_xscratch, nc);
        if (!nb) { free(P->norm); P->norm = NULL; return -1; }
        g_xscratch = nb; g_xscratch_cap = nc;
    }
    int64_t *tl = (int64_t *)g_xscratch;
    int64_t *ls = tl + n;
    int64_t *ec = ls + n;
    int *pre = (int *)(ec + n);
    int *stk = pre + n;
    uint8_t *doomed = (uint8_t *)(stk + n);
    uint8_t *inreg = doomed + n;
    memset(tl, 0, (size_t)n * 3 * sizeof(int64_t));
    memset(doomed, 0, (size_t)n * 2);

    {
    int root = resolve_root(P, NULL);

    /* pass 1: rule removal (doomed subtrees are skipped wholesale — same
     * net tree as extract.py removing every matching node) */
    {
        int sp = 0;
        stk[sp++] = root;
        while (sp > 0) {
            int idx = stk[--sp];
            CNode *nd = ND(P, idx);
            if (nd->kind == K_ELEM && rules_match(P, nd, Xc)) {
                doomed[idx] = 1;
                continue;
            }
            {
                int c;
                for (c = nd->first_child; c >= 0; c = ND(P, c)->next_sib)
                    stk[sp++] = c;
            }
        }
    }

    /* pass 2: link/text-density pruning (extract.py:141-197) */
    if (Xc->max_ld < 1.0 || Xc->min_td > 0) {
        int npre = 0;
        {
            int sp = 0;
            stk[sp++] = root;
            while (sp > 0) {          /* preorder, right children deferred */
                int idx = stk[--sp];
                if (doomed[idx]) continue;
                pre[npre++] = idx;
                inreg[idx] = 1;
                {   /* push children reversed so pops come in order */
                    int c = ND(P, idx)->last_child;
                    while (c >= 0) {
                        stk[sp++] = c;
                        c = ND(P, c)->prev_sib;
                    }
                }
            }
        }
        {   /* children before parents: reverse preorder */
            int i;
            for (i = npre - 1; i >= 0; i--) {
                int idx = pre[i];
                CNode *nd = ND(P, idx);
                if (nd->kind == K_TEXT) {
                    tl[idx] = cp_count(P->text.buf + nd->data_off,
                                       nd->data_len);
                    continue;
                }
                {
                    int64_t t = 0, l = 0, e = 0;
                    int c;
                    for (c = nd->first_child; c >= 0;
                         c = ND(P, c)->next_sib) {
                        if (doomed[c]) continue;
                        t += tl[c]; l += ls[c]; e += ec[c];
                    }
                    if (nd->kind == K_ELEM) {
                        e += 1;
                        /* nested <a> double-counts, as the Python
                         * per-block sum over a.text_content does; the
                         * Python rules are namespace-blind (el.tag only),
                         * so svg/mathml <a> counts too */
                        if (nd->tag == TAG_A) l += t;
                    }
                    tl[idx] = t; ls[idx] = l; ec[idx] = e;
                }
            }
            for (i = npre - 1; i >= 0; i--) {
                int idx = pre[i];
                CNode *nd = ND(P, idx);
                int64_t total, lch;
                int doom;
                if (nd->kind != K_ELEM || doomed[idx] || nd->tag < 0
                    || !Xc->blk[nd->tag] || nd->parent < 0)
                    continue;
                total = tl[idx];
                if (total == 0) continue;
                lch = ls[idx];
                doom = ((double)lch / (double)total > Xc->max_ld
                        && total - lch < Xc->min_bc);
                if (!doom && Xc->min_td > 0)
                    doom = (double)total / (double)ec[idx] < Xc->min_td;
                if (doom) {
                    int64_t e_el = ec[idx], l_el = ls[idx];
                    int64_t k = 0;
                    int anc = nd->parent;
                    doomed[idx] = 1;
                    while (anc >= 0 && inreg[anc]) {
                        CNode *an = ND(P, anc);
                        if (an->kind == K_ELEM && an->tag == TAG_A)
                            k++;
                        tl[anc] -= total;
                        ls[anc] -= l_el + total * k;
                        ec[anc] -= e_el;
                        anc = an->parent;
                    }
                }
            }
        }
    }

    /* text assembly from the re-resolved root (extract.py text_of) */
    {
        int troot = resolve_root(P, doomed);
        int sp = 0;
        stk[sp++] = troot;
        while (sp > 0) {
            int idx = stk[--sp];
            CNode *nd = ND(P, idx);
            if (doomed[idx]) continue;
            if (nd->kind == K_TEXT) {
                if (pool_put(out, P->text.buf + nd->data_off, nd->data_len,
                             NULL) < 0)
                    goto done;
                continue;
            }
            {   /* document order: push children reversed */
                int c = nd->last_child;
                while (c >= 0) {
                    stk[sp++] = c;
                    c = ND(P, c)->prev_sib;
                }
            }
        }
    }

    if (Xc->collapse) {
        /* collapse \s+ runs to a single space and strip, in one pass
         * (extract.py:209: _WS_RUN.sub(" ", text).strip()) — bounded to
         * THIS doc's region of the shared pool */
        size_t o = base, i = base;
        int pending = 0;
        while (i < out->len) {
            int adv;
            uint32_t cp = u8_cp(out->buf + i, &adv);
            if (uws(cp)) {
                if (o > base) pending = 1;
            } else {
                if (pending) { out->buf[o++] = ' '; pending = 0; }
                {
                    int j;
                    for (j = 0; j < adv; j++) out->buf[o++] = out->buf[i + j];
                }
            }
            i += (size_t)adv;
        }
        out->len = o;
    }
    rc = 0;
    }

done:
    free(P->norm); P->norm = NULL;
    if (rc != 0) out->len = base;    /* drop any partial write */
    return rc;
}

static int extract_one(PyObject *src, int scripting, Pool *out) {
    Py_ssize_t n8;
    const char *u8 = PyUnicode_AsUTF8AndSize(src, &n8);
    if (!u8) { PyErr_Clear(); return 1; }
    return extract_one_raw(u8, n8, scripting, out);
}

static PyObject *cextract(PyObject *self, PyObject *args) {
    PyObject *src, *t_tags, *t_cls, *t_ids, *t_attrs, *t_blk;
    int scripting = 1, collapse = 1;
    double max_ld, min_td;
    long min_bc;
    if (!PyArg_ParseTuple(args, "UpOOOOOdldp", &src, &scripting, &t_tags,
                          &t_cls, &t_ids, &t_attrs, &t_blk, &max_ld,
                          &min_bc, &min_td, &collapse))
        return NULL;
    if (xcfg_ensure(t_tags, t_cls, t_ids, t_attrs, t_blk, max_ld, min_bc,
                    min_td, collapse))
        Py_RETURN_NONE;

    Pool out;
    memset(&out, 0, sizeof(out));
    if (extract_one(src, scripting, &out)) {
        free(out.buf);
        Py_RETURN_NONE;
    }
    {
        PyObject *result = PyUnicode_DecodeUTF8(
            (const char *)out.buf, (Py_ssize_t)out.len, NULL);
        free(out.buf);
        if (!result) { PyErr_Clear(); Py_RETURN_NONE; }
        return result;
    }
}

/* extract_many(texts, scripting, cfg...) -> (data, offsets, ok) | None
 *
 * Batched extraction: every document's extracted text lands in ONE packed
 * UTF-8 buffer (no per-doc PyUnicode allocation, no per-doc arg parsing).
 * Returns (data: bytes, offsets: bytes of (len(texts)+1) little-endian
 * int32, ok: bytes of len(texts) 0/1 flags). A doc whose parse bails gets
 * ok=0 and an empty slice — the caller re-runs just those through the
 * Python kernel. The caller builds a pyarrow StringArray directly over
 * (offsets, data), so the batch path never materializes per-doc strings. */
static PyObject *cextract_many(PyObject *self, PyObject *args) {
    PyObject *texts, *t_tags, *t_cls, *t_ids, *t_attrs, *t_blk;
    int scripting = 1, collapse = 1;
    double max_ld, min_td;
    long min_bc;
    if (!PyArg_ParseTuple(args, "OpOOOOOdldp", &texts, &scripting, &t_tags,
                          &t_cls, &t_ids, &t_attrs, &t_blk, &max_ld,
                          &min_bc, &min_td, &collapse))
        return NULL;
    if (xcfg_ensure(t_tags, t_cls, t_ids, t_attrs, t_blk, max_ld, min_bc,
                    min_td, collapse))
        Py_RETURN_NONE;

    PyObject *fast = PySequence_Fast(texts, "texts must be a sequence");
    if (!fast) { PyErr_Clear(); Py_RETURN_NONE; }
    Py_ssize_t m = PySequence_Fast_GET_SIZE(fast);

    Pool out;
    memset(&out, 0, sizeof(out));
    int32_t *offs = (int32_t *)malloc(((size_t)m + 1) * sizeof(int32_t));
    uint8_t *ok = (uint8_t *)malloc((size_t)m ? (size_t)m : 1);
    PyObject *result = NULL;
    if (!offs || !ok) goto done;
    offs[0] = 0;
    {
        Py_ssize_t i;
        for (i = 0; i < m; i++) {
            PyObject *s = PySequence_Fast_GET_ITEM(fast, i);
            int rc;
            if (!PyUnicode_Check(s)) {
                ok[i] = 0;
                offs[i + 1] = (int32_t)out.len;
                continue;
            }
            rc = extract_one(s, scripting, &out);
            if (rc < 0) goto done;                 /* OOM: bail whole call */
            if (out.len > (size_t)INT32_MAX) goto done;
            ok[i] = (rc == 0);
            offs[i + 1] = (int32_t)out.len;
        }
    }
    result = Py_BuildValue(
        "(y#y#y#)",
        (const char *)(out.buf ? out.buf : (uint8_t *)""),
        (Py_ssize_t)out.len,
        (const char *)offs, (Py_ssize_t)((m + 1) * sizeof(int32_t)),
        (const char *)ok, (Py_ssize_t)m);

done:
    Py_DECREF(fast);
    free(out.buf); free(offs); free(ok);
    if (!result) { PyErr_Clear(); Py_RETURN_NONE; }
    return result;
}

/* extract_arrow(data, offsets, start, m, scripting, cfg...)
 *     -> (data, offsets, ok) | None
 *
 * Zero-copy batch entry: the caller passes a pyarrow StringArray's raw
 * value buffer and int32 offsets buffer (plus the array's slice offset),
 * so NO per-document PyUnicode object is ever created on the input side —
 * non-ASCII documents skip a UTF-8 decode+re-encode round trip entirely,
 * ASCII ones skip a memcpy + object allocation. Null slots must be
 * filled upstream (pc.fill_null): the run sees them as empty docs.
 * Output contract is identical to extract_many(). */
static PyObject *cextract_arrow(PyObject *self, PyObject *args) {
    PyObject *o_data, *o_offs, *t_tags, *t_cls, *t_ids, *t_attrs, *t_blk;
    Py_ssize_t start, m;
    int scripting = 1, collapse = 1;
    double max_ld, min_td;
    long min_bc;
    if (!PyArg_ParseTuple(args, "OOnnpOOOOOdldp", &o_data, &o_offs, &start,
                          &m, &scripting, &t_tags, &t_cls, &t_ids, &t_attrs,
                          &t_blk, &max_ld, &min_bc, &min_td, &collapse))
        return NULL;
    if (xcfg_ensure(t_tags, t_cls, t_ids, t_attrs, t_blk, max_ld, min_bc,
                    min_td, collapse))
        Py_RETURN_NONE;

    Py_buffer b_data, b_offs;
    if (PyObject_GetBuffer(o_data, &b_data, PyBUF_SIMPLE) < 0) {
        PyErr_Clear(); Py_RETURN_NONE;
    }
    if (PyObject_GetBuffer(o_offs, &b_offs, PyBUF_SIMPLE) < 0) {
        PyBuffer_Release(&b_data); PyErr_Clear(); Py_RETURN_NONE;
    }
    const char *data = (const char *)b_data.buf;
    const int32_t *ioffs = (const int32_t *)b_offs.buf;
    PyObject *result = NULL;
    Pool out;
    memset(&out, 0, sizeof(out));
    int32_t *offs = NULL;
    uint8_t *ok = NULL;

    /* bounds: need offsets [start, start+m] and data up to the max offset */
    if (start < 0 || m < 0
        || (Py_ssize_t)(b_offs.len / (Py_ssize_t)sizeof(int32_t))
           < start + m + 1)
        goto done;
    offs = (int32_t *)malloc(((size_t)m + 1) * sizeof(int32_t));
    ok = (uint8_t *)malloc((size_t)m ? (size_t)m : 1);
    if (!offs || !ok) goto done;
    offs[0] = 0;
    {
        Py_ssize_t i;
        for (i = 0; i < m; i++) {
            int32_t lo = ioffs[start + i], hi = ioffs[start + i + 1];
            int rc;
            if (lo < 0 || hi < lo || (Py_ssize_t)hi > b_data.len) {
                ok[i] = 0;
                offs[i + 1] = (int32_t)out.len;
                continue;
            }
            rc = extract_one_raw(data + lo, (Py_ssize_t)(hi - lo),
                                 scripting, &out);
            if (rc < 0) goto done;                 /* OOM: bail whole call */
            if (out.len > (size_t)INT32_MAX) goto done;
            ok[i] = (rc == 0);
            offs[i + 1] = (int32_t)out.len;
        }
    }
    result = Py_BuildValue(
        "(y#y#y#)",
        (const char *)(out.buf ? out.buf : (uint8_t *)""),
        (Py_ssize_t)out.len,
        (const char *)offs, (Py_ssize_t)((m + 1) * sizeof(int32_t)),
        (const char *)ok, (Py_ssize_t)m);

done:
    PyBuffer_Release(&b_data);
    PyBuffer_Release(&b_offs);
    free(out.buf); free(offs); free(ok);
    if (!result) { PyErr_Clear(); Py_RETURN_NONE; }
    return result;
}

static PyObject *creg(PyObject *self, PyObject *args) {
    PyObject *doc, *el, *tx, *cm, *dt;
    if (!PyArg_ParseTuple(args, "OOOOO", &doc, &el, &tx, &cm, &dt))
        return NULL;
    Py_XDECREF(g_Document); Py_XDECREF(g_Element); Py_XDECREF(g_Text);
    Py_XDECREF(g_Comment); Py_XDECREF(g_Doctype);
    g_Document = doc; g_Element = el; g_Text = tx; g_Comment = cm;
    g_Doctype = dt;
    Py_INCREF(doc); Py_INCREF(el); Py_INCREF(tx); Py_INCREF(cm);
    Py_INCREF(dt);
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"parse", (PyCFunction)cparse, METH_VARARGS | METH_KEYWORDS,
     "parse(html, scripting=True) -> Document or None (bail)"},
    {"extract", cextract, METH_VARARGS,
     "extract(html, scripting, rm_tags, rm_classes, rm_ids, rm_attrs, "
     "block_tags, max_link_density, min_block_chars, min_text_density, "
     "collapse_ws) -> str or None (bail)"},
    {"extract_many", cextract_many, METH_VARARGS,
     "extract_many(texts, scripting, ...same cfg...) -> "
     "(data, offsets, ok) bytes triple or None"},
    {"extract_arrow", cextract_arrow, METH_VARARGS,
     "extract_arrow(data, offsets, start, m, scripting, ...same cfg...) "
     "-> (data, offsets, ok) bytes triple or None"},
    {"register", creg, METH_VARARGS, "register DOM classes"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_cparser", NULL, -1, methods
};

PyMODINIT_FUNC PyInit__cparser(void) {
    init_dispatch();
    tag_hash_init();
    g_ns[NS_HTML] = PyUnicode_InternFromString("html");
    g_ns[NS_MATHML] = PyUnicode_InternFromString("mathml");
    g_ns[NS_SVG] = PyUnicode_InternFromString("svg");
    g_quirks[QM_NO] = PyUnicode_InternFromString("no-quirks");
    g_quirks[QM_QUIRKS] = PyUnicode_InternFromString("quirks");
    g_quirks[QM_LIMITED] = PyUnicode_InternFromString("limited-quirks");
    g_attr_intern = PyDict_New();
    g_s_parent = PyUnicode_InternFromString("parent");
    g_s_children = PyUnicode_InternFromString("children");
    g_s_quirks_mode = PyUnicode_InternFromString("quirks_mode");
    g_empty_str = PyUnicode_InternFromString("");
    return PyModule_Create(&module);
}
