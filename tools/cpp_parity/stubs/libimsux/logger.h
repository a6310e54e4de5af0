// Logging half of the libimsux stub (see imsux.hxx).  LOGT(fmt, ...) is
// a newline-appending printf; LOGX(severity, flush) evaluates to a
// printf-like callable (the reference's RLOG macro).
#ifndef OIP_PARITY_IMSUX_LOGGER_STUB
#define OIP_PARITY_IMSUX_LOGGER_STUB

#include <cstdarg>
#include <cstdio>

enum {
    LSV_TRACE = 0,
    LSV_DEBUG,
    LSV_INFO,
    LSV_WARN,
    LSV_ERROR,
};

inline void oip_stub_log(const char * fmt, ...) {
    if (!getenv("OIP_PARITY_VERBOSE")) return;
    va_list ap;
    va_start(ap, fmt);
    vfprintf(stderr, fmt, ap);
    va_end(ap);
    fputc('\n', stderr);
}

struct oip_stub_logx {
    void operator()(const char * fmt, ...) const {
        if (!getenv("OIP_PARITY_VERBOSE")) return;
        va_list ap;
        va_start(ap, fmt);
        vfprintf(stderr, fmt, ap);
        va_end(ap);
        fputc('\n', stderr);
    }
};

#define LOGT(...) oip_stub_log(__VA_ARGS__)
#define LOGW(...) oip_stub_log(__VA_ARGS__)
#define LOGE(...) oip_stub_log(__VA_ARGS__)
#define LOGF(...) oip_stub_log(__VA_ARGS__)
#define LOGX(sev, flush) oip_stub_logx {}

#endif  // OIP_PARITY_IMSUX_LOGGER_STUB
