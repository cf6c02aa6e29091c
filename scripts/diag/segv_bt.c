/* LD_PRELOAD SIGSEGV/SIGABRT/SIGBUS backtrace printer for suite forensics.
 *
 * glibc backtrace_symbols_fd() straight to stderr from an altstack, then
 * re-raises with the default handler so the exit code stays 139/134.
 * Not part of the shipped framework. Build + use:
 *   cc -shared -fPIC -O2 -o scripts/diag/segv_bt.so scripts/diag/segv_bt.c
 *   LD_PRELOAD=scripts/diag/segv_bt.so python -m pytest tests/ -q
 */
#define _GNU_SOURCE
#include <execinfo.h>
#include <signal.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

static void handler(int sig, siginfo_t *info, void *ctx) {
    (void)ctx;
    char head[128];
    int n = 0;
    const char *name = sig == SIGSEGV ? "SIGSEGV" : sig == SIGABRT ? "SIGABRT" : "SIGBUS";
    n = (int)strlen(name);
    write(2, "\n==== segv_bt: ", 15);
    write(2, name, n);
    write(2, " ====\n", 6);
    (void)head;
    void *bt[96];
    int depth = backtrace(bt, 96);
    backtrace_symbols_fd(bt, depth, 2);
    write(2, "==== segv_bt end ====\n", 22);
    signal(sig, SIG_DFL);
    raise(sig);
    (void)info;
}

__attribute__((constructor)) static void setup(void) {
    static char stack_mem[256 * 1024];  /* SIGSTKSZ is non-constant in new glibc */
    stack_t ss;
    ss.ss_sp = stack_mem;
    ss.ss_size = sizeof stack_mem;
    ss.ss_flags = 0;
    sigaltstack(&ss, NULL);

    struct sigaction sa;
    memset(&sa, 0, sizeof sa);
    sa.sa_sigaction = handler;
    sa.sa_flags = SA_SIGINFO | SA_ONSTACK;
    sigemptyset(&sa.sa_mask);
    sigaction(SIGSEGV, &sa, NULL);
    sigaction(SIGBUS, &sa, NULL);
    sigaction(SIGABRT, &sa, NULL);
}
