/* kstring stub for the htsshim — the reference includes this header
 * (bamutil.h) but uses no kstring functions. */
#ifndef HTSSHIM_KSTRING_H
#define HTSSHIM_KSTRING_H

#include <stddef.h>

typedef struct kstring_t {
    size_t l, m;
    char *s;
} kstring_t;

#define KS_INITIALIZE { 0, 0, NULL }

#endif
