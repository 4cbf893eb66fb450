/* htsshim implementation: zlib-backed BGZF/BAM IO sufficient to run the
 * reference gencore binary (see htslib/sam.h for the covered surface).
 *
 * Read path: BGZF block parse (gzip member with BC extra subfield), raw
 * inflate, CRC32 verify. Write path: 64KB block buffering, raw deflate at
 * zlib default level (same as stock htslib without libdeflate), standard
 * 28-byte BGZF EOF marker on close. SAM text write supported ("w" mode);
 * SAM text read is not (all validation inputs are BAM).
 */
#include "htslib/sam.h"

#include <zlib.h>

#include <cstdio>
#include <cstring>
#include <string>

namespace {

constexpr int BGZF_MAX = 0x10000;       // 64KB uncompressed block cap
constexpr int BGZF_INPUT_CHUNK = 0xff00; // htsshim write flush threshold

const uint8_t BGZF_EOF[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0, 0, 0, 0, 0, 0, 0, 0};

}  // namespace

struct htsshim_file {
    FILE *fp = nullptr;
    bool owns_fp = true;
    bool writing = false;
    bool binary = true;   // BAM (BGZF) vs SAM text
    bool eof = false;
    // read state: current inflated block
    uint8_t ubuf[BGZF_MAX];
    int ulen = 0;
    int upos = 0;
    // write state: pending uncompressed bytes
    uint8_t wbuf[BGZF_MAX];
    int wlen = 0;
    std::string name;
};

/* ---------------- BGZF block layer ---------------- */

static int bgzf_read_block(htsshim_file *f) {
    uint8_t hdr[12];
    size_t got = fread(hdr, 1, 12, f->fp);
    if (got == 0) { f->eof = true; return 0; }
    if (got != 12 || hdr[0] != 0x1f || hdr[1] != 0x8b || hdr[2] != 8 ||
        !(hdr[3] & 4))
        return -1;
    int xlen = hdr[10] | (hdr[11] << 8);
    uint8_t extra[256];
    if (xlen > (int)sizeof(extra) || (int)fread(extra, 1, xlen, f->fp) != xlen)
        return -1;
    int bsize = -1;
    for (int off = 0; off + 4 <= xlen;) {
        int slen = extra[off + 2] | (extra[off + 3] << 8);
        if (extra[off] == 'B' && extra[off + 1] == 'C' && slen == 2)
            bsize = (extra[off + 4] | (extra[off + 5] << 8)) + 1;
        off += 4 + slen;
    }
    if (bsize < 12 + xlen + 8) return -1;
    int cdata_len = bsize - 12 - xlen - 8;
    uint8_t cbuf[BGZF_MAX + 1024];
    if (cdata_len > (int)sizeof(cbuf) ||
        (int)fread(cbuf, 1, cdata_len, f->fp) != cdata_len)
        return -1;
    uint8_t tail[8];
    if (fread(tail, 1, 8, f->fp) != 8) return -1;
    uint32_t crc_exp, isize;
    memcpy(&crc_exp, tail, 4);
    memcpy(&isize, tail + 4, 4);
    if (isize > BGZF_MAX) return -1;

    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return -1;
    zs.next_in = cbuf;
    zs.avail_in = cdata_len;
    zs.next_out = f->ubuf;
    zs.avail_out = BGZF_MAX;
    int zr = inflate(&zs, Z_FINISH);
    int out = (int)zs.total_out;
    inflateEnd(&zs);
    if (zr != Z_STREAM_END || out != (int)isize) return -1;
    if (crc32(0, f->ubuf, out) != crc_exp) return -1;
    f->ulen = out;
    f->upos = 0;
    if (out == 0 && cdata_len <= 6) {
        // EOF marker block; keep reading (there may be trailing blocks)
        return bgzf_read_block(f);
    }
    return out;
}

static int bgzf_read(htsshim_file *f, void *dst, int n) {
    uint8_t *p = (uint8_t *)dst;
    int done = 0;
    while (done < n) {
        if (f->upos >= f->ulen) {
            int r = bgzf_read_block(f);
            if (r < 0) return -2;
            if (f->eof) return done;
        }
        int take = f->ulen - f->upos;
        if (take > n - done) take = n - done;
        memcpy(p + done, f->ubuf + f->upos, take);
        f->upos += take;
        done += take;
    }
    return done;
}

static int bgzf_flush_block(htsshim_file *f) {
    if (f->wlen == 0) return 0;
    uint8_t cbuf[BGZF_MAX + 1024];
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return -1;
    zs.next_in = f->wbuf;
    zs.avail_in = f->wlen;
    zs.next_out = cbuf;
    zs.avail_out = sizeof(cbuf);
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) { deflateEnd(&zs); return -1; }
    int clen = (int)zs.total_out;
    deflateEnd(&zs);

    int bsize = clen + 12 + 6 + 8;  // hdr + xtra(BC) + cdata + crc/isize
    uint8_t hdr[18] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff, 6, 0,
                       'B', 'C', 2, 0, 0, 0};
    hdr[16] = (bsize - 1) & 0xff;
    hdr[17] = ((bsize - 1) >> 8) & 0xff;
    uint32_t crc = crc32(0, f->wbuf, f->wlen);
    uint32_t isize = f->wlen;
    if (fwrite(hdr, 1, 18, f->fp) != 18) return -1;
    if ((int)fwrite(cbuf, 1, clen, f->fp) != clen) return -1;
    if (fwrite(&crc, 4, 1, f->fp) != 1) return -1;
    if (fwrite(&isize, 4, 1, f->fp) != 1) return -1;
    f->wlen = 0;
    return 0;
}

static int bgzf_write(htsshim_file *f, const void *src, int n) {
    const uint8_t *p = (const uint8_t *)src;
    int done = 0;
    while (done < n) {
        int take = BGZF_INPUT_CHUNK - f->wlen;
        if (take > n - done) take = n - done;
        memcpy(f->wbuf + f->wlen, p + done, take);
        f->wlen += take;
        done += take;
        if (f->wlen >= BGZF_INPUT_CHUNK && bgzf_flush_block(f) < 0) return -1;
    }
    return done;
}

/* ---------------- file open/close ---------------- */

extern "C" samFile *sam_open(const char *fn, const char *mode) {
    htsshim_file *f = new htsshim_file();
    f->name = fn ? fn : "-";
    bool rd = mode[0] == 'r';
    f->writing = !rd;
    if (rd) {
        f->fp = (f->name == "-") ? stdin : fopen(fn, "rb");
        f->owns_fp = f->name != "-";
        if (!f->fp) { delete f; return nullptr; }
        // peek: BGZF or text
        int c0 = fgetc(f->fp);
        int c1 = fgetc(f->fp);
        if (c0 == EOF) { f->binary = true; f->eof = true; return f; }
        ungetc(c1, f->fp);
        ungetc(c0, f->fp);
        f->binary = (c0 == 0x1f && c1 == 0x8b);
        if (!f->binary) {
            fprintf(stderr, "htsshim: SAM text input is not supported (%s)\n", fn);
            if (f->owns_fp) fclose(f->fp);
            delete f;
            return nullptr;
        }
    } else {
        f->binary = strchr(mode, 'b') != nullptr;
        f->fp = (f->name == "-") ? stdout : fopen(fn, f->binary ? "wb" : "w");
        f->owns_fp = f->name != "-";
        if (!f->fp) { delete f; return nullptr; }
    }
    return f;
}

extern "C" int sam_close(samFile *fp) {
    if (!fp) return 0;
    int rc = 0;
    if (fp->writing && fp->binary) {
        if (bgzf_flush_block(fp) < 0) rc = -1;
        if (fwrite(BGZF_EOF, 1, 28, fp->fp) != 28) rc = -1;
    }
    if (fp->owns_fp && fclose(fp->fp) != 0) rc = -1;
    delete fp;
    return rc;
}

/* ---------------- header ---------------- */

extern "C" sam_hdr_t *sam_hdr_read(samFile *fp) {
    if (!fp || fp->writing || !fp->binary) return nullptr;
    char magic[4];
    if (bgzf_read(fp, magic, 4) != 4 || memcmp(magic, "BAM\1", 4) != 0)
        return nullptr;
    int32_t l_text;
    if (bgzf_read(fp, &l_text, 4) != 4 || l_text < 0) return nullptr;
    sam_hdr_t *h = (sam_hdr_t *)calloc(1, sizeof(sam_hdr_t));
    h->l_text = l_text;
    h->text = (char *)malloc(l_text + 1);
    if (bgzf_read(fp, h->text, l_text) != l_text) goto fail;
    h->text[l_text] = 0;
    int32_t n_ref;
    if (bgzf_read(fp, &n_ref, 4) != 4 || n_ref < 0) goto fail;
    h->n_targets = n_ref;
    h->target_name = (char **)calloc(n_ref ? n_ref : 1, sizeof(char *));
    h->target_len = (uint32_t *)calloc(n_ref ? n_ref : 1, sizeof(uint32_t));
    for (int i = 0; i < n_ref; i++) {
        int32_t l_name, l_ref;
        if (bgzf_read(fp, &l_name, 4) != 4 || l_name <= 0) goto fail;
        h->target_name[i] = (char *)malloc(l_name);
        if (bgzf_read(fp, h->target_name[i], l_name) != l_name) goto fail;
        if (bgzf_read(fp, &l_ref, 4) != 4) goto fail;
        h->target_len[i] = l_ref;
    }
    return h;
fail:
    bam_hdr_destroy(h);
    return nullptr;
}

extern "C" int sam_hdr_write(samFile *fp, const sam_hdr_t *h) {
    if (!fp || !fp->writing) return -1;
    if (!fp->binary) {
        if (h->l_text && fwrite(h->text, 1, h->l_text, fp->fp) != h->l_text)
            return -1;
        if (h->l_text && h->text[h->l_text - 1] != '\n') fputc('\n', fp->fp);
        return 0;
    }
    if (bgzf_write(fp, "BAM\1", 4) != 4) return -1;
    int32_t l_text = (int32_t)h->l_text;
    bgzf_write(fp, &l_text, 4);
    bgzf_write(fp, h->text, l_text);
    int32_t n = h->n_targets;
    bgzf_write(fp, &n, 4);
    for (int i = 0; i < n; i++) {
        int32_t l_name = (int32_t)strlen(h->target_name[i]) + 1;
        bgzf_write(fp, &l_name, 4);
        bgzf_write(fp, h->target_name[i], l_name);
        int32_t l_ref = (int32_t)h->target_len[i];
        bgzf_write(fp, &l_ref, 4);
    }
    return 0;
}

extern "C" void bam_hdr_destroy(sam_hdr_t *h) {
    if (!h) return;
    if (h->target_name) {
        for (int i = 0; i < h->n_targets; i++) free(h->target_name[i]);
        free(h->target_name);
    }
    free(h->target_len);
    free(h->text);
    free(h);
}

/* ---------------- records ---------------- */

extern "C" bam1_t *bam_init1(void) {
    return (bam1_t *)calloc(1, sizeof(bam1_t));
}

extern "C" void bam_destroy1(bam1_t *b) {
    if (!b) return;
    free(b->data);
    free(b);
}

static int bam_reserve(bam1_t *b, int need) {
    if ((int)b->m_data >= need) return 0;
    uint32_t m = b->m_data ? b->m_data : 256;
    while ((int)m < need) m <<= 1;
    uint8_t *d = (uint8_t *)realloc(b->data, m);
    if (!d) return -1;
    b->data = d;
    b->m_data = m;
    return 0;
}

extern "C" int sam_read1(samFile *fp, sam_hdr_t *, bam1_t *b) {
    if (!fp || fp->writing) return -2;
    int32_t block_len;
    int r = bgzf_read(fp, &block_len, 4);
    if (r == 0) return -1;              // clean EOF
    if (r != 4 || block_len < 32) return -2;
    uint8_t fixed[32];
    if (bgzf_read(fp, fixed, 32) != 32) return -2;
    int32_t v;
    bam1_core_t *c = &b->core;
    memcpy(&v, fixed + 0, 4); c->tid = v;
    memcpy(&v, fixed + 4, 4); c->pos = v;
    uint8_t l_read_name = fixed[8];
    c->qual = fixed[9];
    c->bin = fixed[10] | (fixed[11] << 8);
    c->n_cigar = fixed[12] | (fixed[13] << 8);
    c->flag = fixed[14] | (fixed[15] << 8);
    memcpy(&v, fixed + 16, 4); c->l_qseq = v;
    memcpy(&v, fixed + 20, 4); c->mtid = v;
    memcpy(&v, fixed + 24, 4); c->mpos = v;
    memcpy(&v, fixed + 28, 4); c->isize = v;
    if (l_read_name == 0) return -4;
    // 4-byte alignment of cigar: pad qname with extra NULs in memory,
    // exactly as stock htslib does on read
    c->l_extranul = (l_read_name % 4 != 0) ? (4 - l_read_name % 4) : 0;
    c->l_qname = l_read_name + c->l_extranul;
    int rest = block_len - 32;
    int need = rest + c->l_extranul;
    if (bam_reserve(b, need) < 0) return -4;
    if (bgzf_read(fp, b->data, l_read_name) != l_read_name) return -2;
    for (int i = 0; i < c->l_extranul; i++) b->data[l_read_name + i] = 0;
    int tail = rest - l_read_name;
    if (bgzf_read(fp, b->data + c->l_qname, tail) != tail) return -2;
    b->l_data = need;
    return need;
}

static int write_record_binary(samFile *fp, const bam1_t *b) {
    const bam1_core_t *c = &b->core;
    int l_read_name = c->l_qname - c->l_extranul;
    int32_t block_len = b->l_data - c->l_extranul + 32;
    uint8_t fixed[32];
    int32_t v;
    v = c->tid; memcpy(fixed + 0, &v, 4);
    v = (int32_t)c->pos; memcpy(fixed + 4, &v, 4);
    fixed[8] = (uint8_t)l_read_name;
    fixed[9] = c->qual;
    fixed[10] = c->bin & 0xff; fixed[11] = c->bin >> 8;
    fixed[12] = c->n_cigar & 0xff; fixed[13] = (c->n_cigar >> 8) & 0xff;
    fixed[14] = c->flag & 0xff; fixed[15] = c->flag >> 8;
    v = c->l_qseq; memcpy(fixed + 16, &v, 4);
    v = c->mtid; memcpy(fixed + 20, &v, 4);
    v = (int32_t)c->mpos; memcpy(fixed + 24, &v, 4);
    v = (int32_t)c->isize; memcpy(fixed + 28, &v, 4);
    if (bgzf_write(fp, &block_len, 4) != 4) return -1;
    if (bgzf_write(fp, fixed, 32) != 32) return -1;
    if (bgzf_write(fp, b->data, l_read_name) != l_read_name) return -1;
    int tail = b->l_data - c->l_qname;
    if (bgzf_write(fp, b->data + c->l_qname, tail) != tail) return -1;
    return block_len + 4;
}

static const char SEQ_NT16_STR[] = "=ACMGRSVTWYHKDBN";

static int write_record_text(samFile *fp, const sam_hdr_t *h, const bam1_t *b) {
    const bam1_core_t *c = &b->core;
    FILE *out = fp->fp;
    fputs(bam_get_qname(b), out);
    fprintf(out, "\t%d\t%s\t%lld\t%d\t", c->flag,
            (c->tid >= 0 && h && c->tid < h->n_targets) ? h->target_name[c->tid]
                                                        : "*",
            (long long)(c->pos + 1), c->qual);
    if (c->n_cigar == 0) {
        fputc('*', out);
    } else {
        const uint32_t *cg = bam_get_cigar(b);
        for (uint32_t i = 0; i < c->n_cigar; i++)
            fprintf(out, "%u%c", bam_cigar_oplen(cg[i]), bam_cigar_opchr(cg[i]));
    }
    if (c->mtid < 0) fputs("\t*", out);
    else if (c->mtid == c->tid) fputs("\t=", out);
    else fprintf(out, "\t%s", (h && c->mtid < h->n_targets)
                                  ? h->target_name[c->mtid] : "*");
    fprintf(out, "\t%lld\t%lld\t", (long long)(c->mpos + 1),
            (long long)c->isize);
    if (c->l_qseq) {
        const uint8_t *s = bam_get_seq(b);
        for (int i = 0; i < c->l_qseq; i++) fputc(SEQ_NT16_STR[bam_seqi(s, i)], out);
        fputc('\t', out);
        const uint8_t *q = bam_get_qual(b);
        if (q[0] == 0xff) fputc('*', out);
        else for (int i = 0; i < c->l_qseq; i++) fputc(q[i] + 33, out);
    } else {
        fputs("*\t*", out);
    }
    // aux tags
    const uint8_t *aux = bam_get_aux(b);
    const uint8_t *end = b->data + b->l_data;
    while (aux + 3 <= end) {
        fprintf(out, "\t%c%c:", aux[0], aux[1]);
        char t = aux[2];
        aux += 3;
        switch (t) {
            case 'A': fprintf(out, "A:%c", *aux); aux++; break;
            case 'C': fprintf(out, "i:%u", *aux); aux++; break;
            case 'c': fprintf(out, "i:%d", *(int8_t *)aux); aux++; break;
            case 'S': { uint16_t x; memcpy(&x, aux, 2); fprintf(out, "i:%u", x); aux += 2; break; }
            case 's': { int16_t x; memcpy(&x, aux, 2); fprintf(out, "i:%d", x); aux += 2; break; }
            case 'I': { uint32_t x; memcpy(&x, aux, 4); fprintf(out, "i:%u", x); aux += 4; break; }
            case 'i': { int32_t x; memcpy(&x, aux, 4); fprintf(out, "i:%d", x); aux += 4; break; }
            case 'f': { float x; memcpy(&x, aux, 4); fprintf(out, "f:%g", x); aux += 4; break; }
            case 'Z': case 'H':
                fprintf(out, "%c:", t == 'H' ? 'H' : 'Z');
                while (aux < end && *aux) fputc(*aux++, out);
                aux++;
                break;
            case 'B': {
                char st = *aux++;
                int32_t n; memcpy(&n, aux, 4); aux += 4;
                fprintf(out, "B:%c", st);
                int sz = (st=='c'||st=='C') ? 1 : (st=='s'||st=='S') ? 2 : 4;
                for (int32_t i = 0; i < n; i++) {
                    int64_t x = 0;
                    if (st=='c') x = *(int8_t*)aux; else if (st=='C') x = *aux;
                    else if (st=='s') { int16_t y; memcpy(&y, aux, 2); x = y; }
                    else if (st=='S') { uint16_t y; memcpy(&y, aux, 2); x = y; }
                    else if (st=='i') { int32_t y; memcpy(&y, aux, 4); x = y; }
                    else if (st=='I') { uint32_t y; memcpy(&y, aux, 4); x = y; }
                    else if (st=='f') { float y; memcpy(&y, aux, 4);
                                        fprintf(out, ",%g", y); aux += 4; continue; }
                    fprintf(out, ",%lld", (long long)x);
                    aux += sz;
                }
                break;
            }
            default: aux = end; break;
        }
    }
    fputc('\n', out);
    return 0;
}

extern "C" int sam_write1(samFile *fp, const sam_hdr_t *h, const bam1_t *b) {
    if (!fp || !fp->writing) return -1;
    if (fp->binary) return write_record_binary(fp, b);
    return write_record_text(fp, h, b);
}

/* ---------------- aux ---------------- */

static int aux_value_size(const uint8_t *s, const uint8_t *end) {
    switch (*s) {
        case 'A': case 'C': case 'c': return 1;
        case 'S': case 's': return 2;
        case 'I': case 'i': case 'f': return 4;
        case 'd': return 8;
        case 'Z': case 'H': {
            const uint8_t *p = s + 1;
            while (p < end && *p) p++;
            return (int)(p - s);  // strlen + terminating NUL
        }
        case 'B': {
            if (s + 6 > end) return -1;
            char st = s[1];
            int32_t n; memcpy(&n, s + 2, 4);
            int sz = (st=='c'||st=='C') ? 1 : (st=='s'||st=='S') ? 2 :
                     (st=='i'||st=='I'||st=='f') ? 4 : -1;
            if (sz < 0) return -1;
            return 5 + n * sz;
        }
        default: return -1;
    }
}

extern "C" uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]) {
    uint8_t *s = bam_get_aux(b);
    uint8_t *end = b->data + b->l_data;
    while (s + 3 <= end) {
        if (s[0] == tag[0] && s[1] == tag[1]) return s + 2;
        int sz = aux_value_size(s + 2, end);
        if (sz < 0) return nullptr;
        s += 3 + sz;
    }
    return nullptr;
}

extern "C" int64_t bam_aux2i(const uint8_t *s) {
    switch (*s) {
        case 'C': return s[1];
        case 'c': return (int8_t)s[1];
        case 'S': { uint16_t x; memcpy(&x, s + 1, 2); return x; }
        case 's': { int16_t x; memcpy(&x, s + 1, 2); return x; }
        case 'I': { uint32_t x; memcpy(&x, s + 1, 4); return x; }
        case 'i': { int32_t x; memcpy(&x, s + 1, 4); return x; }
        default: return 0;
    }
}

extern "C" char *bam_aux2Z(const uint8_t *s) {
    if (*s == 'Z' || *s == 'H') return (char *)(s + 1);
    return nullptr;
}

extern "C" int bam_aux_append(bam1_t *b, const char tag[2], char type,
                              int len, const uint8_t *data) {
    int need = b->l_data + 3 + len;
    if (bam_reserve(b, need) < 0) return -1;
    uint8_t *p = b->data + b->l_data;
    p[0] = tag[0];
    p[1] = tag[1];
    p[2] = type;
    memcpy(p + 3, data, len);
    b->l_data = need;
    return 0;
}

/* ---------------- cigar length ---------------- */

extern "C" hts_pos_t bam_cigar2rlen(int n_cigar, const uint32_t *cigar) {
    hts_pos_t l = 0;
    for (int i = 0; i < n_cigar; i++)
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 2)
            l += bam_cigar_oplen(cigar[i]);
    return l;
}

extern "C" hts_pos_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar) {
    hts_pos_t l = 0;
    for (int i = 0; i < n_cigar; i++)
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 1)
            l += bam_cigar_oplen(cigar[i]);
    return l;
}
