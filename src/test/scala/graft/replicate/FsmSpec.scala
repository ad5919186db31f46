package graft.replicate

import org.scalatest.funsuite.AnyFunSuite

class FsmSpec extends AnyFunSuite {
  import FsmState._

  test("initial state is created") {
    assert(new Fsm().state == Created)
  }

  test("happy path: created -> connecting -> streaming -> paused -> streaming -> stopped") {
    val f = new Fsm()
    f.transition(Connecting)
    f.transition(Streaming)
    f.transition(Paused)
    f.transition(Streaming)
    f.transition(Stopped)
    assert(f.state == Stopped)
  }

  test("stopped can restart via connecting (fsm.go:84-86)") {
    val f = new Fsm()
    f.transition(Connecting); f.transition(Streaming); f.transition(Stopped)
    f.transition(Connecting)
    assert(f.state == Connecting)
  }

  test("error recovers via connecting, not reconnecting (fsm.go:80-83)") {
    val f = new Fsm()
    f.transition(Connecting); f.transition(Error)
    assert(!f.canTransition(Reconnecting))
    f.transition(Connecting)
    assert(f.state == Connecting)
  }

  test("illegal transitions throw") {
    val f = new Fsm()
    intercept[IllegalTransitionException](f.transition(Streaming)) // created -/-> streaming
    intercept[IllegalTransitionException](f.transition(Paused))
    assert(f.state == Created)
  }

  test("created cannot error (fsm.go:56-59 has no created->error edge)") {
    assert(!new Fsm().canTransition(Error))
  }

  test("transition map matches the reference exactly") {
    val f = new Fsm()
    val expected = Map(
      Created      -> Set(Connecting, Stopped),
      Connecting   -> Set(Streaming, Error, Stopped),
      Streaming    -> Set(Paused, Stopped, Reconnecting, Error),
      Paused       -> Set(Streaming, Stopped, Error),
      Reconnecting -> Set(Streaming, Error, Stopped),
      Error        -> Set(Connecting, Stopped),
      Stopped      -> Set(Connecting))
    assert(f.legal == expected)
  }
}
