/* Minimal fake libespeak-ng for hermetic tests of the ctypes binding.
 *
 * Mimics the API surface mimic3_tpu/text/espeak.py uses:
 *  - espeak_Initialize
 *  - espeak_SetVoiceByName  (accepts "en-us"/"en-gb"/"de", rejects others)
 *  - espeak_TextToPhonemes  (consumes ONE clause per call, advancing the
 *    text pointer past the clause terminator like the real library;
 *    "phonemes" are the clause's words lowercased, so tests can assert
 *    word/breaker handling without a lexicon)
 *
 * Build: gcc -shared -fPIC tests/fake_espeak.c -o <dir>/libespeak-ng.so.1
 */

#include <ctype.h>
#include <stddef.h>
#include <string.h>

static char out_buf[1024];

int espeak_Initialize(int output, int buflength, const char *path,
                      int options) {
    (void)output; (void)buflength; (void)path; (void)options;
    return 22050; /* sample rate, >0 = success */
}

int espeak_SetVoiceByName(const char *name) {
    if (!name) return 1;
    if (strcmp(name, "en-us") == 0 || strcmp(name, "en-gb") == 0 ||
        strcmp(name, "de") == 0) {
        return 0; /* EE_OK */
    }
    return 1; /* error */
}

static int is_clause_breaker(char c) {
    return c == ',' || c == '.' || c == ';' || c == ':' || c == '!' ||
           c == '?';
}

const char *espeak_TextToPhonemes(const void **textptr, int textmode,
                                  int phonememode) {
    (void)textmode; (void)phonememode;
    const char *text = (const char *)*textptr;
    if (!text || !*text) {
        *textptr = NULL;
        return NULL;
    }

    size_t o = 0;
    size_t i = 0;
    int wrote_word = 0;
    while (text[i] && o + 2 < sizeof(out_buf)) {
        char c = text[i];
        if (is_clause_breaker(c)) {
            i++;
            break; /* clause ends; breaker consumed from input */
        }
        if (isspace((unsigned char)c)) {
            if (wrote_word && o > 0 && out_buf[o - 1] != ' ') {
                out_buf[o++] = ' ';
            }
        } else {
            out_buf[o++] = (char)tolower((unsigned char)c);
            wrote_word = 1;
        }
        i++;
    }
    /* trim trailing space */
    while (o > 0 && out_buf[o - 1] == ' ') o--;
    out_buf[o] = '\0';

    /* skip whitespace after the clause like the real library */
    while (text[i] && isspace((unsigned char)text[i])) i++;
    *textptr = text[i] ? (const void *)(text + i) : NULL;
    return out_buf;
}
