/* Stub libcurl surface (test scaffolding).  The oracle harness never
 * passes -f, so these are link-time placeholders only. */
#ifndef STUB_CURL_H
#define STUB_CURL_H

typedef void CURL;
typedef enum {
    CURLE_OK = 0,
    CURLE_GOT_NOTHING = 52,
} CURLcode;

typedef enum {
    CURLOPT_URL = 10002,
    CURLOPT_WRITEDATA = 10001,
    CURLOPT_VERBOSE = 41,
    CURLOPT_USERPWD = 10005,
    CURLOPT_WRITEFUNCTION = 20011,
    CURLOPT_USE_SSL = 119,
} CURLoption;

typedef enum {
    CURLUSESSL_NONE = 0,
} curl_usessl;

#define CURL_GLOBAL_DEFAULT 3L

CURLcode curl_global_init(long flags);
CURL *curl_easy_init(void);
CURLcode curl_easy_setopt(CURL *h, CURLoption opt, ...);
CURLcode curl_easy_perform(CURL *h);
void curl_easy_cleanup(CURL *h);
void curl_global_cleanup(void);

#endif
