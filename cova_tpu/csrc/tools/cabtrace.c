// ptrace-based CABAC bin tracer: breakpoints get_cabac/get_cabac_noinline
// in a statically linked ffmpeg h264 decoder and logs (ctx, bin) pairs.
// Usage: cabtrace BINARY ADDR1 ADDR2 ... -- args...
#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/ptrace.h>
#include <sys/user.h>
#include <sys/wait.h>
#include <unistd.h>

static pid_t child;

static long peek(long addr) { return ptrace(PTRACE_PEEKTEXT, child, addr, 0); }
static void poke(long addr, long val) { ptrace(PTRACE_POKETEXT, child, addr, val); }

int main(int argc, char** argv) {
  // parse addrs until "--"
  long addrs[8]; int naddr = 0; int i = 2;
  for (; i < argc && strcmp(argv[i], "--"); i++) addrs[naddr++] = strtol(argv[i], 0, 16);
  i++;  // skip --
  char* cargs[16]; int nc = 0;
  cargs[nc++] = argv[1];
  for (; i < argc; i++) cargs[nc++] = argv[i];
  cargs[nc] = 0;

  child = fork();
  if (!child) {
    ptrace(PTRACE_TRACEME, 0, 0, 0);
    execv(argv[1], cargs);
    _exit(1);
  }
  int st; waitpid(child, &st, 0);
  long orig[8];
  for (int k = 0; k < naddr; k++) {
    orig[k] = peek(addrs[k]);
    poke(addrs[k], (orig[k] & ~0xffL) | 0xcc);
  }
  long count = 0;
  while (1) {
    ptrace(PTRACE_CONT, child, 0, 0);
    waitpid(child, &st, 0);
    if (WIFEXITED(st) || WIFSIGNALED(st)) break;
    struct user_regs_struct regs;
    ptrace(PTRACE_GETREGS, child, 0, &regs);
    long rip = regs.rip - 1;
    int k = -1;
    for (int j = 0; j < naddr; j++) if (addrs[j] == rip) k = j;
    if (k < 0) { fprintf(stderr, "unexpected stop at %llx sig %d\n", regs.rip, WSTOPSIG(st)); break; }
    long ctx = regs.rsi - regs.rdi - 0x20;  // state ptr - cabac ptr - 0x20
    int is_ref = (k == naddr - 1) && getenv("TRACE_REF");
    long arg1 = regs.rsi, arg2 = regs.rdx;
    // restore insn, step to return: set bp at return addr
    poke(addrs[k], orig[k]);
    regs.rip = rip;
    ptrace(PTRACE_SETREGS, child, 0, &regs);
    long retaddr = peek(regs.rsp) ;
    long oret = peek(retaddr);
    poke(retaddr, (oret & ~0xffL) | 0xcc);
    ptrace(PTRACE_CONT, child, 0, 0);
    waitpid(child, &st, 0);
    if (WIFEXITED(st)) break;
    ptrace(PTRACE_GETREGS, child, 0, &regs);
    if (regs.rip - 1 != retaddr) { fprintf(stderr, "ret bp miss\n"); break; }
    poke(retaddr, oret);
    regs.rip = retaddr;
    ptrace(PTRACE_SETREGS, child, 0, &regs);
    if (is_ref)
      printf("R list=%ld n=%ld ref=%lld\n", arg1, arg2, regs.rax);
    else
      printf("D ctx=%ld bin=%lld\n", ctx, regs.rax & 1);
    count++;
    if (count > 2000000) break;
    // re-arm entry bp
    poke(addrs[k], (orig[k] & ~0xffL) | 0xcc);
  }
  fprintf(stderr, "traced %ld bins\n", count);
  return 0;
}
